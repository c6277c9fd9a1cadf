"""fsio.Fs: the Hadoop-FileSystem-backed durability I/O layer (r3
VERDICT #4). These run against file: paths — Hadoop's Path.getFileSystem
resolves the same code path a hdfs:/s3a: URI would."""

import os

from oni_indexer_spark.fsio import Fs


def test_roundtrip_and_atomic_replace(spark, tmp_path):
    base = str(tmp_path / "fs")
    fs = Fs(base, spark)
    fs.mkdirs(base + "/d1")
    assert fs.is_dir(base + "/d1")
    fs.write_bytes_atomic(base + "/d1/a.json", b'{"x": 1}')
    assert fs.read_bytes(base + "/d1/a.json") == b'{"x": 1}'
    # replace: second write wins, no .tmp leftover
    fs.write_bytes_atomic(base + "/d1/a.json", b'{"x": 2}')
    assert fs.read_bytes(base + "/d1/a.json") == b'{"x": 2}'
    names = [n for n, *_ in fs.list_status(base + "/d1")]
    assert not any(n.endswith(".tmp") for n in names)
    assert fs.size(base + "/d1/a.json") == len(b'{"x": 2}')


def test_rename_delete_list(spark, tmp_path):
    base = str(tmp_path / "fs2")
    fs = Fs(base, spark)
    fs.mkdirs(base + "/src")
    fs.write_bytes_atomic(base + "/src/f", b"abc")
    assert fs.rename(base + "/src", base + "/dst")
    assert not fs.exists(base + "/src")
    assert fs.read_bytes(base + "/dst/f") == b"abc"
    assert fs.delete(base + "/dst")
    assert not fs.exists(base + "/dst")
    assert fs.list_status(base + "/nope") == []
    assert fs.delete(base + "/nope") is False


def test_matches_local_filesystem_view(spark, tmp_path):
    """file: scheme resolves to the real local fs — what os sees, Fs
    sees (the sandbox proxy for scheme portability)."""
    base = str(tmp_path / "fs3")
    os.makedirs(base + "/x")
    with open(base + "/x/f.json", "w") as fh:
        fh.write("{}")
    fs = Fs(base, spark)
    assert fs.exists(base + "/x/f.json")
    assert {n for n, *_ in fs.list_status(base + "/x")} == {"f.json"}
