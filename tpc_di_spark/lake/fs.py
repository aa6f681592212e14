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

import hashlib
import os
import shutil
import threading
import uuid
from typing import Iterator


class CasConflict(RuntimeError):
    """Conditional PUT failed: the object changed since this handle last
    read it (HTTP 412 Precondition Failed on S3/GCS)."""


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

    def create_text(self, path: str, text: str) -> None:
        """CREATE-ONLY atomic PUT (``If-None-Match: *`` on object stores,
        ``O_EXCL``-style create locally): raises :class:`CasConflict` if
        the object already exists. Two racers creating the same path
        resolve to exactly one winner on EVERY backend — the primitive
        branch-ref creation and write-audit-publish materialization rely
        on (``replace_text`` alone cannot provide this on POSIX, where a
        rename silently replaces)."""
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

    def mtime(self, path: str) -> float:
        """Last-modified time (epoch seconds) of a file — the LastModified
        field of an object-store LIST/HEAD response. Used by snapshot
        expiry's min-age orphan guard."""
        raise NotImplementedError

    def parquet_column_minmax(self, path: str, col: str) -> list | None:
        """[min, max] of ``col`` across the file's row groups, from footer
        statistics only (ranged GET on object stores). None when the
        column is absent or carries no stats — callers must treat that as
        "range unknown, cannot prune"."""
        raise NotImplementedError

    def link_view(self, srcs: list[str], dst_dir: str, names: list[str]) -> bool:
        """OPTIONAL capability: atomically materialize ``dst_dir``
        exposing ``srcs[i]`` under file name ``names[i]`` WITHOUT copying
        bytes (hardlinks on POSIX; links also pin the source inodes so a
        concurrent compaction cannot invalidate a running scan). Used by
        ``LakeTable.read_bucketed`` to present a snapshot's file list as
        the flat directory Spark's bucketed-table scan expects. Returns
        False when the backend has no cheap link primitive (object
        stores have none — callers fall back to the plain read path).
        Idempotent: an existing ``dst_dir`` is a no-op returning True."""
        return False


def _pyarrow_minmax(path: str, col: str) -> list | None:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    schema = md.schema.to_arrow_schema()
    if col not in schema.names:
        return None
    idx = schema.names.index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else [lo, hi]


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

    def create_text(self, path: str, text: str) -> None:
        # Durable create-only: write+fsync a temp file, then hardlink it
        # to the target. link(2) fails with EEXIST if the path exists —
        # an atomic test-and-create, unlike rename's silent replace.
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise CasConflict(f"create-only PUT failed — {path} exists") from e
        finally:
            os.remove(tmp)

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

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def parquet_column_minmax(self, path: str, col: str) -> list | None:
        return _pyarrow_minmax(path, col)

    def link_view(self, srcs: list[str], dst_dir: str, names: list[str]) -> bool:
        if os.path.isdir(dst_dir):
            return True
        tmp = f"{dst_dir}.tmp.{uuid.uuid4().hex[:8]}"
        try:
            os.makedirs(tmp)
            for src, name in zip(srcs, names):
                os.link(src, os.path.join(tmp, name))
        except OSError:
            # EXDEV (data dir on another filesystem, e.g. scratch mounts)
            # or a vanished source: links are an OPTIMIZATION — report
            # "no link primitive here" and let the caller take the plain
            # read path instead of failing the batch.
            shutil.rmtree(tmp, ignore_errors=True)
            return False
        try:
            os.rename(tmp, dst_dir)
        except OSError:  # lost a same-process race; the winner is identical
            shutil.rmtree(tmp, ignore_errors=True)
        return True


class ObjectStoreFS(TableFS):
    """Object-store-semantics implementation, backed by the local disk so
    Spark-written data files remain visible through it.

    This is the executable form of the S3/GCS mapping documented above —
    the lake/orchestrator test suites run against it to prove the table
    format carries NO hidden POSIX assumptions:

    - **No atomic rename.** ``replace_text`` is a *conditional PUT*: the
      new content overwrites in place, guarded by an If-Match check on the
      ETag (content hash) this handle observed at its last ``read_text``
      of the path. A concurrent writer's PUT changes the ETag and the
      conditional PUT raises :class:`CasConflict` — exactly S3/GCS
      compare-and-swap. A path never read by this handle asserts
      If-None-Match:* (create-only).
    - **No directories.** ``makedirs`` is a no-op (object stores have only
      key prefixes); writes create local parent dirs on demand, purely as
      a disk-backing artifact.
    - ``listdir``/``walk_files`` are prefix LISTs; ``mtime`` is the
      LastModified LIST field.
    """

    # Store-side serialization: a real object store orders conditional
    # PUTs server-side across ALL clients, so the CAS critical section is
    # shared by every ObjectStoreFS instance in this process. The ETag
    # cache below stays PER-INSTANCE (per client handle) — two duelling
    # drivers each compare against what *they* last read.
    _STORE_LOCK = threading.Lock()

    def __init__(self) -> None:
        self._seen_etags: dict[str, str] = {}
        self._lock = ObjectStoreFS._STORE_LOCK

    @staticmethod
    def _etag(text: str) -> str:
        return hashlib.md5(text.encode()).hexdigest()

    def read_text(self, path: str) -> str:
        with open(path) as f:
            text = f.read()
        with self._lock:
            self._seen_etags[os.path.abspath(path)] = self._etag(text)
        return text

    def write_text(self, path: str, text: str) -> None:
        # Unconditional PUT of an immutable object. Whole-object PUTs are
        # atomic on object stores; the local backing write is good enough
        # for tests (nothing reads an immutable object before the commit
        # point names it).
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
        with self._lock:
            self._seen_etags[os.path.abspath(path)] = self._etag(text)

    def replace_text(self, path: str, text: str) -> None:
        key = os.path.abspath(path)
        with self._lock:
            expected = self._seen_etags.get(key)
            if os.path.exists(path):
                with open(path) as f:
                    current = self._etag(f.read())
                if expected is None:
                    raise CasConflict(
                        f"If-None-Match:* failed — {path} already exists"
                    )
                if current != expected:
                    raise CasConflict(
                        f"If-Match failed on {path}: object changed since last read"
                    )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # A real store's whole-object PUT is atomic to readers; a
            # truncate-then-write here would let a concurrent read_text
            # observe an empty/torn object — weaker than the semantics
            # being emulated. The temp-file + os.replace is purely the
            # local-disk mechanism for an atomic PUT (the CAS check above
            # remains the only commit primitive the table relies on).
            tmp = f"{path}.put-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as f:
                f.write(text)
            os.replace(tmp, path)
            self._seen_etags[key] = self._etag(text)

    def create_text(self, path: str, text: str) -> None:
        # If-None-Match:* — a PUT conditioned on non-existence, regardless
        # of what this handle has read before (replace_text's implicit
        # create-only applies only to never-read paths).
        with self._lock:
            if os.path.exists(path):
                raise CasConflict(
                    f"If-None-Match:* failed — {path} already exists"
                )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.put-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as f:
                f.write(text)
            os.replace(tmp, path)
            self._seen_etags[os.path.abspath(path)] = self._etag(text)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def makedirs(self, path: str) -> None:
        pass  # key prefixes need no creation

    def listdir(self, path: str) -> list[str]:
        if not os.path.isdir(path):
            return []  # empty prefix LIST, not an error
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

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def parquet_column_minmax(self, path: str, col: str) -> list | None:
        return _pyarrow_minmax(path, col)
