from neo4j_webgraph_ray.cli import main

raise SystemExit(main())
