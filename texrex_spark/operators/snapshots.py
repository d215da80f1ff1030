"""Snapshot catalog: Iceberg-equivalent table checkpoints on parquet.

The north rule names Iceberg tables as the crawl substrate ("resumable
from Iceberg snapshot checkpoints").  This sandbox ships NO Iceberg
runtime: neither Spark install has an iceberg jar (0 matches in
/opt/spark/jars and pyspark/jars) and `--packages org.apache.iceberg:
iceberg-spark-runtime-4.0_2.13:1.10.0` fails in ~230 ms with "unresolved
dependency ... not found" (no network for Ivy/Maven) — evidence recorded
in BASELINE.md.  This module therefore implements the three Iceberg
mechanics the design actually depends on, on plain parquet + JSON:

1. **Atomic snapshot commit** — data files are written first, then a
   ``manifest-<id>.json`` naming them is os.replace()'d into place, then
   the ``version-hint.text`` pointer is swapped (Iceberg's
   HadoopTableOperations uses the same rename-commit + version-hint
   protocol).  A reader never sees a half-written snapshot.
2. **Time travel / rollback** — every snapshot's manifest and data stay
   addressable by id; ``read(name, snapshot_id=...)`` pins one, and
   ``rollback`` moves the pointer (Iceberg ``rollback_to_snapshot``).
3. **Per-partition lineage** — the manifest records per-table row counts
   and the writing round; the seen-set's bucket bitmaps are snapshotted
   copy-on-write next to the tables, so a resume sees bitmaps consistent
   with the pinned round (at 10^10 scale this becomes per-bucket delta
   files; buckets untouched in a round need no copy).

Swapping in real Iceberg later is a mechanical change: ``commit`` becomes
``df.writeTo(t).append()`` + snapshot id capture, ``read`` a snapshot-id
read option, ``rollback`` the catalog procedure.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotCatalog:
    root: str

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)

    # -- paths -----------------------------------------------------------

    def _snap_dir(self, sid: int) -> str:
        return os.path.join(self.root, f"snap-{sid:06d}")

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.root, f"manifest-{sid:06d}.json")

    # -- commit ----------------------------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        round_no: int,
        extra: dict | None = None,
        seen_dir: str | None = None,
    ) -> int:
        """Write all tables + (optionally) the seen-set bucket bitmaps as
        one atomic snapshot; returns the new snapshot id."""
        sid = (self.latest_id() or 0) + 1
        snap = self._snap_dir(sid)
        manifest: dict = {"snapshot_id": sid, "round": round_no, "tables": {}}
        for name, df in tables.items():
            path = os.path.join(snap, name)
            df.write.mode("overwrite").parquet(path)
            manifest["tables"][name] = {
                "path": path,
                "rows": df.count(),
                "schema": df.schema.simpleString(),
            }
        if seen_dir is not None:
            dst = os.path.join(snap, "seen")
            os.makedirs(dst, exist_ok=True)
            buckets = glob.glob(os.path.join(seen_dir, "bucket-*.pkl"))
            for b in buckets:
                shutil.copy2(b, os.path.join(dst, os.path.basename(b)))
            manifest["seen"] = {"path": dst, "buckets": len(buckets)}
        if extra:
            manifest["extra"] = extra
        tmp = self._manifest_path(sid) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(sid))  # the commit point
        hint_tmp = os.path.join(self.root, ".version-hint.tmp")
        with open(hint_tmp, "w") as f:
            f.write(str(sid))
        os.replace(hint_tmp, os.path.join(self.root, "version-hint.text"))
        return sid

    # -- read ------------------------------------------------------------

    def latest_id(self) -> int | None:
        hint = os.path.join(self.root, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as f:
                return int(f.read().strip())
        ids = sorted(
            int(p.rsplit("-", 1)[1].split(".")[0])
            for p in glob.glob(os.path.join(self.root, "manifest-*.json"))
        )
        return ids[-1] if ids else None

    def manifest(self, snapshot_id: int | None = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.latest_id()
        if sid is None:
            raise FileNotFoundError(f"no snapshots in {self.root}")
        with open(self._manifest_path(sid)) as f:
            return json.load(f)

    def read(
        self, spark: SparkSession, name: str, snapshot_id: int | None = None
    ) -> DataFrame:
        m = self.manifest(snapshot_id)
        return spark.read.parquet(m["tables"][name]["path"])

    def restore_seen(self, snapshot_id: int | None, seen_dir: str) -> int:
        """Copy the pinned snapshot's bucket bitmaps over the working
        seen-set directory (resume = bitmaps as of that round)."""
        m = self.manifest(snapshot_id)
        if "seen" not in m:
            return 0
        os.makedirs(seen_dir, exist_ok=True)
        for b in glob.glob(os.path.join(seen_dir, "bucket-*.pkl")):
            os.remove(b)
        n = 0
        for b in glob.glob(os.path.join(m["seen"]["path"], "bucket-*.pkl")):
            shutil.copy2(b, os.path.join(seen_dir, os.path.basename(b)))
            n += 1
        return n

    def rollback(self, snapshot_id: int) -> None:
        self.manifest(snapshot_id)  # raises if missing
        tmp = os.path.join(self.root, ".version-hint.tmp")
        with open(tmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(tmp, os.path.join(self.root, "version-hint.text"))
