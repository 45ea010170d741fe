"""Checkpoint manifest for the superstep harness.

The reference's batch importer is explicitly NOT crash-safe — "the
insertion has to be re-done from scratch" on crash
(``importer/BatchGraphImporter.java:22-29``); only the crawl frontier
resumes (``importer/App.java:308-312``).  The north rule upgrades this:
every superstep checkpoints per-partition vertex-state Parquet plus a
manifest carrying lineage (input fingerprint + config hash + operator
chain) and per-step metrics (rank delta / changed count / message
count), so a killed run resumes mid-algorithm and a resume against
changed input fails loudly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from neo4j_webgraph_ray.state import fsio


@dataclass
class Manifest:
    algo: str
    num_partitions: int
    config: dict[str, Any]
    input_fingerprint: dict[str, Any]
    lineage: list[str] = field(default_factory=list)
    steps: list[dict[str, Any]] = field(default_factory=list)
    status: str = "running"
    # run-metadata scalar block: the entry-point / root-input record the
    # reference keeps as ROOT_PAGE_REFERENCE run metadata
    # (``importer/AbstractObservableGraphImporter.java:90-92``) — which
    # run produced this workdir, from what input, via which surface
    run_metadata: dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "algo": self.algo,
            "num_partitions": self.num_partitions,
            "config": self.config,
            "input_fingerprint": self.input_fingerprint,
            "lineage": self.lineage,
            "steps": self.steps,
            "status": self.status,
            "run_metadata": self.run_metadata,
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Manifest":
        return cls(
            algo=d["algo"],
            num_partitions=d["num_partitions"],
            config=d["config"],
            input_fingerprint=d["input_fingerprint"],
            lineage=d.get("lineage", []),
            steps=d.get("steps", []),
            status=d.get("status", "running"),
            run_metadata=d.get("run_metadata", {}),
        )


def manifest_path(workdir: str) -> str:
    return fsio.join(workdir, "manifest.json")


def save_manifest(workdir: str, m: Manifest, fs=None) -> None:
    """Never-torn write (temp + rename where rename is atomic, direct
    all-or-nothing PUT on object stores — see fsio.write_json_atomic)."""
    fsio.write_json_atomic(m.to_dict(), manifest_path(workdir), fs=fs)


def load_manifest(workdir: str, fs=None) -> Manifest | None:
    path = manifest_path(workdir)
    if not fsio.exists(path, fs=fs):
        return None
    return Manifest.from_dict(fsio.read_json(path, fs=fs))


def state_dir(workdir: str, step: int) -> str:
    return fsio.join(workdir, "state", f"step={step:05d}")


def edges_dir(workdir: str) -> str:
    return fsio.join(workdir, "edges")


def atomic_write_parquet(table, path: str, fs=None) -> None:
    """Write Parquet with never-torn visibility — idempotent under Ray
    task retries; a re-run of the same write produces the same file."""
    fsio.write_table_atomic(table, path, fs=fs)
