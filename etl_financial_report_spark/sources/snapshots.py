"""Manifest-based snapshot table: Delta/Iceberg-style versioned reads,
time travel, optimistic concurrency, and copy-on-write MERGE over plain
parquet files — no table-format jars required (the image has none; see
README limitations). This upgrades the S14 story from "partition
overwrite dance" to real snapshot semantics:

  * every commit writes its data files under ``data/commit-v{N}/`` and
    then publishes ``_manifests/v{N}.json`` listing the COMPLETE file set
    of that version (previous files + new for append; replacement set for
    replace/merge);
  * publication is a single atomic ``os.link`` of a temp file onto the
    version path — it either fully succeeds or fails with EEXIST, so two
    racing writers cannot both claim a version (optimistic concurrency,
    the loser retries on the new base). On a real object store this is
    the conditional-PUT the formats use;
  * readers resolve a manifest ONCE and read exactly its files —
    concurrent commits never tear a read, and any historical version
    stays readable (time travel) until a vacuum drops it;
  * MERGE is copy-on-write: the merged result lands as a full new file
    set under a new version — the previous snapshot is untouched, so a
    failed merge changes nothing and a retry is safe.

At 100 TB the manifest holds file paths + counts, not data; commits are
O(new files) and reads are O(manifest). A production deployment would
add partition pruning stats per file (the layout module's min/max story)
— the commit protocol is the part that cannot be bolted on later.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first — re-read and retry."""


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self._data = os.path.join(path, "data")
        self._manifests = os.path.join(path, "_manifests")

    # ----------------------------------------------------------- versions

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifests):
            return []
        out = []
        for f in os.listdir(self._manifests):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._manifests, f"v{version}.json")

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    # ------------------------------------------------------------- commit

    def _write_files(self, df: DataFrame, version: int) -> list[str]:
        """Land the dataframe's files for ``version``; returns paths
        relative to the table root. The commit dir name embeds a uuid so
        a LOSING writer's files never collide with the winner's."""
        sub = f"commit-v{version}-{uuid.uuid4().hex[:8]}"
        out_dir = os.path.join(self._data, sub)
        df.write.parquet(out_dir)
        return [
            os.path.join("data", sub, f)
            for f in sorted(os.listdir(out_dir))
            if f.endswith(".parquet")
        ]

    def _publish(
        self, version: int, files: list[str], op: str, tag: str | None = None
    ) -> int:
        os.makedirs(self._manifests, exist_ok=True)
        tmp = os.path.join(self._manifests, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "op": op, "files": files, "tag": tag}, f, indent=1
            )
        try:
            # atomic claim: link fails with EEXIST if another writer won
            os.link(tmp, self._manifest_path(version))
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} already committed — rebase and retry"
            ) from None
        finally:
            os.unlink(tmp)
        return version

    def commit_append(self, df: DataFrame, tag: str | None = None) -> int | None:
        """Append a new version. ``tag`` makes the commit idempotent per
        tag (e.g. a streaming micro-batch id): if any manifest already
        carries it, the call is a no-op returning None — the
        exactly-once contract a replayed foreachBatch needs, enforced at
        the SINK, not by the caller remembering."""
        if tag is not None and tag in self.committed_tags():
            return None
        base = self.current_version()
        prev_files = self._read_manifest(base)["files"] if base is not None else []
        version = (base if base is not None else -1) + 1
        new_files = self._write_files(df, version)
        return self._publish(version, prev_files + new_files, "append", tag=tag)

    def committed_tags(self) -> set[str]:
        return {
            t
            for v in self.versions()
            if (t := self._read_manifest(v).get("tag")) is not None
        }

    def commit_replace(self, df: DataFrame) -> int:
        base = self.current_version()
        version = (base if base is not None else -1) + 1
        return self._publish(version, self._write_files(df, version), "replace")

    def commit_merge(self, updates: DataFrame, key_cols: list[str]) -> int:
        """Copy-on-write MERGE (the S14 semantics): rows in ``updates``
        REPLACE current rows with the same key; unmatched update rows
        INSERT. The merged result is a full new snapshot — the base
        version remains readable and a failed/abandoned merge publishes
        nothing."""
        spark = updates.sparkSession
        base = self.current_version()
        if base is None:
            return self.commit_replace(updates)
        current = self.read(spark, base)
        keep = current.join(updates.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = keep.unionByName(updates)
        version = base + 1
        return self._publish(version, self._write_files(merged, version), "merge")

    # --------------------------------------------------------------- read

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read one pinned snapshot (latest by default). The file list is
        resolved from the manifest HERE, once — later commits cannot tear
        this read, and any retained version time-travels."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"{self.path}: no committed version")
        files = self._read_manifest(v)["files"]
        if not files:
            raise FileNotFoundError(f"{self.path}: version {v} is empty")
        return spark.read.parquet(*[os.path.join(self.path, f) for f in files])

    # ------------------------------------------------------------- vacuum

    def vacuum(self, keep_versions: int = 1) -> dict:
        """Drop manifests older than the newest ``keep_versions`` and
        delete data files no retained manifest references. Bounded
        driver-side metadata work (file LISTS, never data)."""
        vs = self.versions()
        retained = vs[-keep_versions:] if keep_versions > 0 else []
        live: set[str] = set()
        for v in retained:
            live.update(self._read_manifest(v)["files"])
        removed_files = 0
        for root, _dirs, files in os.walk(self._data):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), self.path)
                if f.endswith(".parquet") and rel not in live:
                    os.unlink(os.path.join(self.path, rel))
                    removed_files += 1
        removed_manifests = 0
        for v in vs:
            if v not in retained:
                os.unlink(self._manifest_path(v))
                removed_manifests += 1
        return {
            "removed_files": removed_files,
            "removed_manifests": removed_manifests,
            "retained_versions": retained,
        }
