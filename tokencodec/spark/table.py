"""Snapshot-committed table: parquet data + JSON manifests.

The sandbox has no iceberg-spark-runtime jar, so per SURVEY.md §7.4 we
implement the same commit/resume contract on plain parquet with our own
snapshot/manifest JSON (the thin API below is what an Iceberg catalog
would replace). This is our analog of the reference's footer metadata
(FileMetaData + row groups, /root/reference/src/Parquet/Reader.hs:197-213):
a small trailer that tells readers exactly which byte containers make
up the table.

Layout:
    {root}/data/run-{run_id}/...parquet     (written by Spark jobs)
    {root}/_manifest/snapshot-{N}.json      (immutable)
    {root}/_manifest/CURRENT                (atomic pointer, os.replace)

A snapshot records {group_key: [data paths]} plus lineage/metrics.
Readers load ONLY paths listed in the current snapshot — files from
failed runs are invisible orphans (Iceberg semantics).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -------------------------------------------------------------- reads
    def current_snapshot(self) -> dict | None:
        cur = os.path.join(self.manifest_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)

    def committed_groups(self) -> dict[str, list[str]]:
        snap = self.current_snapshot()
        return dict(snap["groups"]) if snap else {}

    def data_paths(self) -> list[str]:
        paths: list[str] = []
        for ps in self.committed_groups().values():
            paths.extend(ps)
        return paths

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith("snapshot-"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    # ------------------------------------------------------------- writes
    def new_run_dir(self) -> str:
        run_id = uuid.uuid4().hex[:12]
        return os.path.join(self.root, "data", f"run-{run_id}")

    def commit(self, new_groups: dict[str, list[str]], metrics: dict | None = None) -> dict:
        """Append ``new_groups`` to the current snapshot atomically."""
        parent = self.current_snapshot()
        sid = (parent["snapshot_id"] + 1) if parent else 0
        groups = dict(parent["groups"]) if parent else {}
        for k, v in new_groups.items():
            if k in groups:
                raise ValueError(f"group {k} already committed (snapshot {parent['snapshot_id']})")
            groups[k] = v
        snap = {
            "snapshot_id": sid,
            "parent_id": parent["snapshot_id"] if parent else None,
            "timestamp_ms": int(time.time() * 1000),
            "groups": groups,
            "new_groups": sorted(new_groups),
            "metrics": metrics or {},
        }
        name = f"snapshot-{sid:06d}.json"
        # optimistic concurrency: snapshot ids are claimed with O_EXCL,
        # so two committers racing on the same parent fail loudly
        # instead of silently overwriting (Iceberg's commit semantics)
        fd = os.open(os.path.join(self.manifest_dir, name),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f, indent=1)
        tmp2 = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp2, "w") as f:
            f.write(name)
        os.replace(tmp2, os.path.join(self.manifest_dir, "CURRENT"))
        return snap
