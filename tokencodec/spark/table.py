"""Snapshot-committed table: parquet data + JSON manifests.

The sandbox has no iceberg-spark-runtime jar, so per SURVEY.md §7.4 we
implement the same commit/resume contract on plain parquet with our own
snapshot/manifest JSON (the thin API below is what an Iceberg catalog
would replace). This is our analog of the reference's footer metadata
(FileMetaData + row groups, /root/reference/src/Parquet/Reader.hs:197-213):
a small trailer that tells readers exactly which byte containers make
up the table.

Manifest IO goes through a pluggable filesystem (tokencodec/spark/
fsio.py): plain paths and file:// use the local OS, any other scheme
(hdfs://, s3a://, ...) is served by Spark's Hadoop filesystem — the
table root is scheme-transparent end to end (Spark jobs read/write the
same URIs natively).

Layout:
    {root}/data/run-{run_id}/...parquet     (written by Spark jobs)
    {root}/_manifest/snapshot-{N}.json      (immutable)
    {root}/_manifest/CURRENT                (atomic pointer swap)

A snapshot records {group_key: [data paths]} plus lineage/metrics.
Readers load ONLY paths listed in the current snapshot — files from
failed runs are invisible orphans (Iceberg semantics).
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

from tokencodec.spark.fsio import fs_for


class SnapshotTable:
    def __init__(self, root: str, fs=None):
        self.root = root
        self.fs = fs if fs is not None else fs_for(root)
        self.manifest_dir = posixpath.join(root, "_manifest")
        self.fs.mkdirs(self.manifest_dir)

    # -------------------------------------------------------------- reads
    def current_snapshot(self) -> dict | None:
        cur = posixpath.join(self.manifest_dir, "CURRENT")
        if not self.fs.exists(cur):
            return None
        name = self.fs.read_text(cur).strip()
        return json.loads(self.fs.read_text(posixpath.join(self.manifest_dir, name)))

    def snapshot(self, snapshot_id: int) -> dict:
        """Load a specific (immutable) snapshot — time travel."""
        name = f"snapshot-{snapshot_id:06d}.json"
        path = posixpath.join(self.manifest_dir, name)
        if not self.fs.exists(path):
            raise FileNotFoundError(f"no snapshot {snapshot_id} under {self.root}")
        return json.loads(self.fs.read_text(path))

    def committed_groups(self, snapshot_id: int | None = None) -> dict[str, list[str]]:
        snap = (self.current_snapshot() if snapshot_id is None
                else self.snapshot(snapshot_id))
        return dict(snap["groups"]) if snap else {}

    def data_paths(self, snapshot_id: int | None = None) -> list[str]:
        paths: list[str] = []
        for ps in self.committed_groups(snapshot_id).values():
            paths.extend(ps)
        return paths

    def snapshots(self) -> list[dict]:
        """Every well-formed snapshot MANIFEST, ordered numerically by
        id (lexicographic listdir order breaks once ids outgrow the
        6-digit name padding). Includes unreachable claim files left by
        committers that crashed before their CURRENT swap — use
        :meth:`chain` for the committed history. Torn/partial files are
        skipped rather than poisoning every metadata walk."""
        out = []
        for name in self.fs.listdir(self.manifest_dir):
            if name.startswith("snapshot-"):
                try:
                    s = json.loads(self.fs.read_text(
                        posixpath.join(self.manifest_dir, name)))
                except ValueError:
                    continue
                if isinstance(s, dict) and "snapshot_id" in s and "groups" in s:
                    out.append(s)
        out.sort(key=lambda s: s["snapshot_id"])
        return out

    def chain(self, snapshot_id: int | None = None) -> list[dict]:
        """The committed history: CURRENT (or ``snapshot_id``) followed
        back through parent_id links, returned oldest-first. Claim files
        beyond the anchor — a crashed committer's never-swapped snapshot
        — are excluded, so maintenance walking this can never mistake an
        uncommitted claim for the newest snapshot. A parent expired away
        simply ends the chain (the list then starts mid-history; its
        first element has a non-None parent_id)."""
        snap = (self.current_snapshot() if snapshot_id is None
                else self.snapshot(snapshot_id))
        out: list[dict] = []
        while snap is not None:
            out.append(snap)
            pid = snap.get("parent_id")
            if pid is None:
                break
            path = posixpath.join(self.manifest_dir,
                                  f"snapshot-{pid:06d}.json")
            if not self.fs.exists(path):
                break  # expired: truncated history
            snap = json.loads(self.fs.read_text(path))
        out.reverse()
        return out

    # ------------------------------------------------------------- writes
    def new_run_dir(self) -> str:
        run_id = uuid.uuid4().hex[:12]
        return posixpath.join(self.root, "data", f"run-{run_id}")

    def commit(self, new_groups: dict[str, list[str]], metrics: dict | None = None,
               replace: bool = False, retries: int = 3) -> dict:
        """Append ``new_groups`` to the current snapshot atomically.

        ``replace=True`` swaps the data paths of EXISTING group keys
        instead (Iceberg's rewrite-files semantics — used by
        compaction): the group's logical rows must be identical, only
        their physical layout changes. Old files stay referenced by the
        parent snapshot until expired, so time travel keeps working.

        Optimistic concurrency with retry (Iceberg's commit loop): the
        snapshot id is claimed create-exclusive; when another committer
        wins the race, the commit is re-based onto the NEW current
        snapshot and re-validated — an append retries unless its group
        key now exists, a replace retries unless its key vanished. After
        ``retries`` lost races it raises the FileExistsError.

        The claimed id skips past every existing snapshot-*.json, not
        just past CURRENT: a committer that crashed after claiming a
        file but before the CURRENT swap would otherwise collide every
        retry forever and wedge the table. Chain integrity is carried by
        parent_id links (ids may skip numbers); the dead claim becomes
        an unreachable manifest that chain() ignores."""
        last_err: Exception | None = None
        for _ in range(retries + 1):
            parent = self.current_snapshot()
            claimed = [int(n[len("snapshot-"):-len(".json")])
                       for n in self.fs.listdir(self.manifest_dir)
                       if n.startswith("snapshot-") and n.endswith(".json")
                       and n[len("snapshot-"):-len(".json")].isdigit()]
            sid = max([(parent["snapshot_id"] + 1) if parent else 0,
                       *[c + 1 for c in claimed]], default=0)
            groups = dict(parent["groups"]) if parent else {}
            for k, v in new_groups.items():
                if replace:
                    if k not in groups:
                        raise ValueError(f"cannot replace unknown group {k}")
                elif k in groups:
                    raise ValueError(
                        f"group {k} already committed (snapshot {parent['snapshot_id']})")
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
            try:
                self.fs.create_excl(posixpath.join(self.manifest_dir, name),
                                    json.dumps(snap, indent=1))
            except FileExistsError as e:
                last_err = e
                continue  # lost the race: re-base on the winner and retry
            self.fs.write_atomic(posixpath.join(self.manifest_dir, "CURRENT"), name)
            return snap
        raise last_err
