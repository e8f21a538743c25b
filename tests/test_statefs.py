"""StateFs (streaming/statefs.py): the Hadoop-FileSystem-backed state
I/O the maintenance sinks use for CURRENT pointers and manifests.
These tests run against the local filesystem through the SAME Hadoop
API path a cluster would use for hdfs:// (LocalFileSystem implements
the identical interface), so the pointer-swap, listing, and delete
semantics are exercised for real — only the scheme differs."""

from __future__ import annotations

import os


def _fs(spark, tmp_path):
    from fotmobdatapipeline_spark.streaming.statefs import StateFs

    base = str(tmp_path / "state")
    sfs = StateFs(spark, base)
    sfs.mkdirs()
    return sfs, base


def test_pointer_roundtrip_and_overwrite(spark, tmp_path):
    sfs, base = _fs(spark, tmp_path)
    assert sfs.read_text("CURRENT") is None
    sfs.write_text_atomic("CURRENT", "v0")
    assert sfs.read_text("CURRENT") == "v0"
    # Overwrite (the swap case): readers must see old-or-new, and the
    # temp file must not survive a successful publish.
    sfs.write_text_atomic("CURRENT", "m3c\n#applied d0\n#applied d1")
    assert sfs.read_text("CURRENT") == "m3c\n#applied d0\n#applied d1"
    assert not os.path.exists(os.path.join(base, "CURRENT.tmp"))


def test_listdir_dirs_only_and_delete(spark, tmp_path):
    sfs, base = _fs(spark, tmp_path)
    sfs.write_text_atomic("m0", "d0")
    os.makedirs(os.path.join(base, "v0"))
    os.makedirs(os.path.join(base, "v1"))
    names = set(sfs.listdir())
    assert {"m0", "v0", "v1"} <= names
    assert set(sfs.listdir(dirs_only=True)) >= {"v0", "v1"}
    assert "m0" not in sfs.listdir(dirs_only=True)
    assert sfs.is_dir("v0") and not sfs.is_dir("m0")
    sfs.delete("v1", recursive=True)
    assert not sfs.exists("v1")
    sfs.delete("m0")
    assert not sfs.exists("m0")


def test_publish_version_retention(spark, tmp_path):
    """_publish_version keeps new + keep_versions priors, GCs the rest —
    the sinks' shared GC path, driven directly."""
    from fotmobdatapipeline_spark.streaming.sketches import (
        _current_version,
        _publish_version,
    )

    sfs, base = _fs(spark, tmp_path)
    for b in range(4):
        os.makedirs(os.path.join(base, f"v{b}"))
        _publish_version(sfs, f"v{b}", keep_versions=1)
    assert _current_version(base, spark) == "v3"
    assert _current_version(base) == "v3"  # spark-less local fallback agrees
    dirs = sorted(d for d in os.listdir(base) if d.startswith("v"))
    assert dirs == ["v2", "v3"], dirs


def test_interop_with_plain_local_writes(spark, tmp_path):
    """A pointer written by plain open() (pre-r7 layouts, tests) must
    read back through the Hadoop path, and vice versa — on-disk format
    is unchanged by the FS port."""
    sfs, base = _fs(spark, tmp_path)
    with open(os.path.join(base, "CURRENT"), "w") as f:
        f.write("v7")
    assert sfs.read_text("CURRENT") == "v7"
    sfs.write_text_atomic("POINTER2", "v8")
    with open(os.path.join(base, "POINTER2")) as f:
        assert f.read() == "v8"
