"""Filesystem abstraction for the engine's durability metadata — lineage
records, index meta, and the overwrite swap manifest.

All I/O here goes through Hadoop's ``FileSystem`` API via the JVM
gateway (r3 VERDICT #4): the north_rule's target is a multi-executor
cluster whose index paths live on HDFS / S3A / GCS / ABFS, where
``os.rename`` does not exist — ``FileSystem.rename/delete/listStatus``
are the portable operations, and ``Path.getFileSystem`` picks the right
implementation per scheme (``file:`` paths resolve to the local
filesystem, so the sandbox's tests exercise the exact same code path).

The reference keeps its state in Solr + local JSON config
(``oni-indexer.js:82-104``); this module is the Spark-native durable
analogue. Only small control-plane records flow through it — the data
plane (postings/doclen/dfreq parquet) always goes through Spark's own
writers, which are already scheme-portable.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# fsio's PRIVATE FileSystem instances, one per (scheme, authority).
# ``Path.getFileSystem`` returns the JVM-WIDE CACHED instance for the
# scheme, so toggling checksums on it would disable corruption detection
# for EVERY reader in the application (parquet footers included) — the
# r4 ADVICE finding. ``FileSystem.newInstance`` gives fsio its own
# handle; it is cached here (not closed per call) because instances hold
# real resources (HDFS client threads) and fsio traffic is tiny
# control-plane JSON for the application's whole lifetime.
_PRIVATE_FS: dict[str, object] = {}


def _active_spark(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError(
            "fsio needs an active SparkSession (Hadoop FileSystem lives in the JVM)"
        )
    return s


class Fs:
    """Thin handle on a PRIVATE Hadoop FileSystem for ``base_path``'s
    scheme (never the JVM-wide cached instance — see ``_PRIVATE_FS``).

    One instance per operation-batch (holds JVM refs); all methods accept
    full path strings (same scheme as ``base_path``).
    """

    def __init__(self, base_path: str, spark: SparkSession | None = None):
        s = _active_spark(spark)
        self._jvm = s._jvm
        conf = s._jsc.hadoopConfiguration()
        uri = self._jvm.org.apache.hadoop.fs.Path(base_path).toUri()
        key = f"{uri.getScheme()}|{uri.getAuthority()}"
        fs = _PRIVATE_FS.get(key)
        if fs is None:
            # private instance: checksum toggles below affect ONLY fsio
            fs = self._jvm.org.apache.hadoop.fs.FileSystem.newInstance(uri, conf)
            # No client-side .crc sidecars (LocalFileSystem wraps a
            # ChecksumFileSystem; HDFS ignores these calls): the records
            # here are tiny atomically-replaced JSON, and sidecars break
            # reads after any out-of-band edit by a non-Hadoop writer.
            try:
                fs.setWriteChecksum(False)
                fs.setVerifyChecksum(False)
            except Exception:
                pass  # not every FileSystem implements the checksum toggles
            _PRIVATE_FS[key] = fs
        self._fs = fs

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def is_dir(self, path: str) -> bool:
        p = self._p(path)
        return bool(self._fs.exists(p)) and bool(self._fs.getFileStatus(p).isDirectory())

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def delete(self, path: str, recursive: bool = True) -> bool:
        """Best-effort delete (False when absent) — the idempotent-replay
        semantics every swap step relies on."""
        return bool(self._fs.delete(self._p(path), recursive))

    def rename(self, src: str, dst: str) -> bool:
        return bool(self._fs.rename(self._p(src), self._p(dst)))

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getLen())

    def list_status(self, path: str) -> list[tuple[str, bool, int, int]]:
        """``[(name, is_dir, mtime_ms, size)]``; empty when absent."""
        p = self._p(path)
        if not self._fs.exists(p):
            return []
        return [
            (
                st.getPath().getName(),
                bool(st.isDirectory()),
                int(st.getModificationTime()),
                int(st.getLen()),
            )
            for st in self._fs.listStatus(p)
        ]

    def read_bytes(self, path: str) -> bytes:
        p = self._p(path)
        if not self._fs.exists(p):
            raise FileNotFoundError(path)
        stream = self._fs.open(p)
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def write_bytes_atomic(self, path: str, data: bytes) -> None:
        """Write via a sibling ``.tmp`` then delete-target + rename.

        On filesystems with atomic rename (HDFS, ``file:``) a reader
        never observes a torn file. The delete→rename window can LOSE
        the record on stores without atomic replace — safe for every
        caller by design: a lost lineage record re-runs its (idempotent)
        stage, and a lost swap manifest is indistinguishable from a
        crash before the manifest, which leaves the live index untouched.
        """
        tmp = path + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        self._fs.delete(self._p(path), False)
        if not self._fs.rename(self._p(tmp), self._p(path)):
            raise IOError(f"rename {tmp} -> {path} failed")
