"""S8 backup/archive/age-GC sinks (the reference's dataset-preservation
utilities: copytree backup, zip/tar.gz archive, mtime GC)."""

import os
import tarfile
import zipfile

import pytest

from webscrape_neko_jirushi_ray.state.archive import (
    archive_dir,
    backup_dir,
    gc_backups,
)


@pytest.fixture()
def layout(tmp_path):
    src = tmp_path / "final"
    (src / "cat_0001").mkdir(parents=True)
    (src / "cat_0001" / "image_001.jpg").write_bytes(b"fake1")
    (src / "cat_0002").mkdir()
    (src / "cat_0002" / "image_001.jpg").write_bytes(b"fake2")
    (src / "info.json").write_text("{}")
    return src


def test_backup_roundtrip_and_no_overwrite(layout, tmp_path):
    root = tmp_path / "backups"
    dest = backup_dir(str(layout), str(root), run_id="r1")
    assert os.path.isdir(dest)
    assert open(os.path.join(dest, "cat_0001", "image_001.jpg"), "rb").read() == b"fake1"
    with pytest.raises(FileExistsError):
        backup_dir(str(layout), str(root), run_id="r1")


def test_archive_targz_and_zip(layout, tmp_path):
    tgz = archive_dir(str(layout), str(tmp_path / "a" / "final.tar.gz"))
    with tarfile.open(tgz) as tf:
        names = tf.getnames()
    assert "final/cat_0002/image_001.jpg" in names
    z = archive_dir(str(layout), str(tmp_path / "a" / "final.zip"), fmt="zip")
    with zipfile.ZipFile(z) as zf:
        assert "final/info.json" in zf.namelist()
        assert zf.read("final/cat_0001/image_001.jpg") == b"fake1"
    with pytest.raises(ValueError):
        archive_dir(str(layout), str(tmp_path / "x.rar"), fmt="rar")


def test_gc_by_age(layout, tmp_path):
    root = tmp_path / "backups"
    old = backup_dir(str(layout), str(root), run_id="old")
    new = backup_dir(str(layout), str(root), run_id="new")
    ten_days_ago = os.path.getmtime(new) - 10 * 86400
    os.utime(old, (ten_days_ago, ten_days_ago))
    # dry run reports without deleting
    listed = gc_backups(str(root), max_age_days=7, dry_run=True)
    assert listed == [old] and os.path.isdir(old)
    removed = gc_backups(str(root), max_age_days=7)
    assert removed == [old]
    assert not os.path.exists(old) and os.path.isdir(new)
    # non-backup entries are never touched
    keep = root / "unrelated"
    keep.mkdir()
    assert gc_backups(str(root), max_age_days=0) == [os.path.join(str(root), "backup_new")]
    assert keep.is_dir()
