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


def test_private_fs_instance_isolated_from_global_cache(spark, tmp_path):
    """fsio's checksum toggles must NOT leak to the JVM-wide cached
    FileSystem for the scheme (r4 ADVICE: Path.getFileSystem returns the
    shared instance used by parquet footer reads etc.)."""
    base = str(tmp_path / "fs4")
    Fs(base, spark)  # creates/configures fsio's private instance
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    shared = jvm.org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    # LocalFileSystem (ChecksumFileSystem) writes .crc sidecars iff
    # writeChecksum is on — prove the SHARED instance still has them on
    p = jvm.org.apache.hadoop.fs.Path(base + "/shared_probe")
    shared.mkdirs(p.getParent())
    out = shared.create(p, True)
    out.write(bytearray(b"x"))
    out.close()
    assert os.path.exists(str(tmp_path / "fs4" / ".shared_probe.crc")), (
        "global FileSystem lost its checksum setting — fsio leaked its toggle"
    )
    # and fsio's own writes produce no sidecars
    fs = Fs(base, spark)
    fs.write_bytes_atomic(base + "/fsio_probe", b"y")
    assert not os.path.exists(str(tmp_path / "fs4" / ".fsio_probe.crc"))


def test_meta_recovers_from_lost_rename(spark, tmp_path):
    """meta.json loss in the delete->rename window recovers from the
    .tmp sibling (r4 ADVICE #3)."""
    import json

    from oni_indexer_spark.index.lineage import Lineage

    lin = Lineage(spark, str(tmp_path / "idx"))
    lin.write_meta({"format": 99})
    assert lin.read_meta() == {"format": 99}
    # simulate the non-atomic store's loss window: target gone, tmp present
    meta = lin.dir + "/meta.json"
    lin.fs.write_bytes_atomic(meta + ".probe", b"")  # ensure fs usable
    raw = lin.fs.read_bytes(meta)
    out = lin.fs._fs.create(lin.fs._p(meta + ".tmp"), True)
    out.write(bytearray(raw))
    out.close()
    lin.fs.delete(meta, recursive=False)
    assert lin.read_meta() == {"format": 99}


def test_generation_token_unique_per_bump(spark, tmp_path):
    from oni_indexer_spark.index.lineage import Lineage

    lin = Lineage(spark, str(tmp_path / "idx2"))
    assert lin.read_generation() is None
    lin.bump_generation()
    g1 = lin.read_generation()
    lin.bump_generation()
    g2 = lin.read_generation()
    assert g1 is not None and g2 is not None and g1 != g2
