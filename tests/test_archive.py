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


def test_backup_of_old_source_not_born_gc_eligible(layout, tmp_path):
    """ADVICE r2: copytree copystat's the SOURCE dir's mtime onto the
    backup; GC ages by mtime. A backup of an old layout must NOT be
    immediately GC-eligible — creation time is stamped at backup."""
    import time

    old_ts = time.time() - 30 * 86400
    os.utime(layout, (old_ts, old_ts))
    root = tmp_path / "backups"
    dest = backup_dir(str(layout), str(root), run_id="ofold")
    # a GC right after the backup must keep the fresh safety copy
    removed = gc_backups(str(root), max_age_days=7)
    assert removed == [] and os.path.isdir(dest)


def test_list_backups_newest_first(layout, tmp_path):
    from webscrape_neko_jirushi_ray.state.archive import list_backups

    root = tmp_path / "backups"
    assert list_backups(str(root)) == []  # missing root -> empty
    a = backup_dir(str(layout), str(root), run_id="a")
    b = backup_dir(str(layout), str(root), run_id="b")
    z = archive_dir(str(layout), os.path.join(str(root), "backup_z.tar.gz"))
    one_day = 86400
    base = os.path.getmtime(b)
    os.utime(a, (base - 2 * one_day,) * 2)
    os.utime(z, (base - 1 * one_day,) * 2)
    rows = list_backups(str(root))
    assert [r["path"] for r in rows] == [b, z, a]  # mtime desc (O2 order)
    assert all(r["size_bytes"] > 0 for r in rows)
    assert rows[0]["is_dir"] and not rows[1]["is_dir"]
    (tmp_path / "backups" / "not_a_backup.txt").write_text("x")
    assert len(list_backups(str(root))) == 3  # prefix-filtered


def test_export_summary_roundtrip(tmp_path):
    import json

    from webscrape_neko_jirushi_ray.state.archive import export_summary

    out = export_summary(
        {"cats": 3, "images": 12},
        str(tmp_path / "sub" / "summary.json"),
        data_dir="/data/final",
        now=1_700_000_000.0,
    )
    with open(out, encoding="utf-8") as f:
        got = json.load(f)
    assert got["statistics"] == {"cats": 3, "images": 12}
    assert got["data_directory"] == "/data/final"
    assert got["exported_at"].startswith("2023-11-1")
