"""Index manifest: the atomic "commit" of a build, with per-segment lineage.

Reference parity: a Lucene ``commit()`` makes index + taxonomy durable and
visible (/root/reference/src/org/meresco/lucene/Lucene.java:899-944).  Here a
commit is the atomic publication of ``manifest.json`` naming the complete set
of segment directories; query actors open exactly the segments the manifest
lists, and a rebuild run skips any segment whose lineage entry is already
complete (resumable builds with per-partition lineage + metrics, per the
north rule).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field, asdict
from typing import Any


@dataclass
class SegmentInfo:
    shard: int
    num_docs: int
    sum_dl: int
    num_terms: int
    path: str  # relative to index dir
    fingerprint: str  # hash of config + input lineage for resume checks


@dataclass
class IndexManifest:
    version: int
    num_docs: int
    sum_dl: int
    num_shards: int
    config: dict[str, Any]
    segments: list[SegmentInfo] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.num_docs if self.num_docs else 0.0

    def save(self, index_dir: str) -> str:
        """Atomically publish the manifest (write temp + rename)."""
        path = os.path.join(index_dir, "manifest.json")
        d = asdict(self)
        fd, tmp = tempfile.mkstemp(dir=index_dir, prefix=".manifest.")
        with os.fdopen(fd, "w") as f:
            json.dump(d, f, indent=1)
        os.replace(tmp, path)
        return path

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            d = json.load(f)
        d["segments"] = [SegmentInfo(**s) for s in d["segments"]]
        return cls(**d)
