"""Metadata filesystem seam for the lake table format.

Every *metadata* operation the table format performs — snapshot reads and
writes, the atomic VERSION pointer flip, manifest listing, parquet footer
reads, orphan cleanup — goes through this interface, so the format is
deployable on an object store by swapping one class. *Data* file I/O
(the parquet reads/writes themselves) already goes through Spark's Hadoop
FileSystem layer and follows the path scheme (``s3a://``, ``hdfs://``,
``file:``) without any code change here.

Mapping to real backends (documented, not shipped — this sandbox has no
cloud SDKs or extra Hadoop jars):

- **Local / NFS / HDFS**: ``replace_text`` = write temp + fsync + rename.
  POSIX and HDFS renames are atomic; this is exactly Iceberg's
  HadoopTableOperations commit.
- **S3 / GCS**: rename is not atomic; ``replace_text`` on the VERSION
  object maps to a conditional PUT (``If-Match`` on the ETag read at
  snapshot load — S3 and GCS both support compare-and-swap puts), which
  preserves the optimistic-concurrency contract `LakeTable._flip_version`
  relies on. Snapshot JSON files are immutable single PUTs (no atomicity
  needed — they are invisible until VERSION names them). ``listdir`` maps
  to a prefix LIST; ``parquet_num_rows`` to a ranged GET of the footer
  (pyarrow does this natively over fsspec/s3fs).

All table paths are '/'-separated keys relative to the table root, valid
verbatim as object-store keys.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator


class TableFS:
    """Abstract metadata filesystem. Paths are plain strings."""

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        """Create an immutable metadata file (no atomicity requirement:
        callers only reference it after a successful replace_text)."""
        raise NotImplementedError

    def replace_text(self, path: str, text: str) -> None:
        """Atomically replace ``path`` with ``text`` — readers see either
        the old or the new content, never a partial write. The commit
        point of every table transaction."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        """Yield every file path under ``root`` (prefix LIST on object
        stores)."""
        raise NotImplementedError

    def parquet_num_rows(self, path: str) -> int:
        """Row count from the parquet footer — metadata-sized I/O, never a
        full file read (ranged GET on object stores)."""
        raise NotImplementedError


class LocalFS(TableFS):
    """POSIX implementation: rename-based atomic replace."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text(self, path: str, text: str) -> None:
        # Immutable-file writes share the atomic path so a crash mid-write
        # can never leave a torn snapshot JSON on disk.
        self.replace_text(path, text)

    def replace_text(self, path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                yield os.path.join(dirpath, fn)

    def parquet_num_rows(self, path: str) -> int:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_rows
