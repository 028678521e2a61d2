"""Backup / archive / age-GC sinks (S8 — the last §2.1 operator).

Rebuild of the reference's dataset-preservation utilities:
- directory backup before destructive steps (cleanup_dataset.py:46-64,
  advanced_cleaning.py:77-85, aggressive_cleaning.py:74-82,
  yolo_cat_detector.py:77-85 — each script copytree's the dataset aside
  before touching it);
- zip/tar.gz archives of a finished layout (data_manager.py:63-121);
- age-based GC of old backups (data_manager.py's cleanup of stale copies).

Engine framing: pipeline OUTPUTS are already immutable per-round parquet
dirs (the safe-by-construction substitute), so these sinks exist for the
operational workflow around them — park a copy before a risky rerun,
ship an archive, bound backup disk. All driver-side filesystem ops on
final layouts (small relative to pipeline data); clocks are injectable so
tests are deterministic.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import time
import zipfile

BACKUP_PREFIX = "backup_"


def backup_dir(src: str, backup_root: str, run_id: str | None = None) -> str:
    """Copy ``src`` to ``backup_root/backup_<run_id>`` (copytree — the
    reference's pre-cleaning safety copy). ``run_id`` defaults to a
    second-resolution timestamp; pass one explicitly for deterministic
    naming. Refuses to overwrite an existing backup of the same id."""
    if run_id is None:
        run_id = time.strftime("%Y%m%d_%H%M%S")
    dest = os.path.join(backup_root, f"{BACKUP_PREFIX}{run_id}")
    if os.path.exists(dest):
        raise FileExistsError(f"backup already exists: {dest}")
    os.makedirs(backup_root, exist_ok=True)
    shutil.copytree(src, dest)
    # copytree copystat's the SOURCE dir's mtime onto the backup; gc_backups
    # ages by mtime, so a backup of an old layout would be born GC-eligible
    # and the next GC would delete the fresh safety copy. Stamp creation
    # time instead.
    os.utime(dest, None)
    return dest


def archive_dir(src: str, dest: str, fmt: str = "tar.gz") -> str:
    """Archive ``src`` into ``dest`` ('tar.gz' or 'zip'), atomic via
    tmp+rename. Paths inside the archive are relative to ``src``."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".tmp"
    if fmt == "tar.gz":
        with tarfile.open(tmp, "w:gz") as tf:
            tf.add(src, arcname=os.path.basename(src.rstrip(os.sep)))
    elif fmt == "zip":
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            base = src.rstrip(os.sep)
            for root, _dirs, files in os.walk(base):
                for f in sorted(files):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        os.path.basename(base), os.path.relpath(full, base)
                    )
                    zf.write(full, rel)
    else:
        raise ValueError(f"unsupported archive format {fmt!r}")
    os.replace(tmp, dest)
    return dest


def list_backups(backup_root: str) -> list[dict]:
    """Inventory of ``backup_*`` entries (dirs or archives) under
    ``backup_root``, newest first (mtime-desc — the O2 sort of the
    reference's listing, data_manager.py:148-172, which orders by
    creation time; backups here are stamped with creation time at write).
    Each row: name, path, size_bytes, mtime (epoch seconds), is_dir."""
    if not os.path.isdir(backup_root):
        return []
    out: list[dict] = []
    for name in sorted(os.listdir(backup_root)):
        if not name.startswith(BACKUP_PREFIX):
            continue
        path = os.path.join(backup_root, name)
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _dn, fns in os.walk(path)
                for f in fns
            )
        else:
            size = os.path.getsize(path)
        out.append(
            {
                "name": name,
                "path": path,
                "size_bytes": size,
                "mtime": os.path.getmtime(path),
                "is_dir": os.path.isdir(path),
            }
        )
    out.sort(key=lambda r: (-r["mtime"], r["name"]))
    return out


def export_summary(
    stats: dict,
    out_file: str,
    *,
    data_dir: str | None = None,
    now: float | None = None,
) -> str:
    """Write a JSON summary of a dataset layout (data_manager.py:123-146):
    the stats payload plus the export timestamp and source directory.
    Atomic tmp+rename; returns the path. ``now`` is injectable for
    deterministic tests."""
    import datetime as _dt
    import json as _json

    ts = now if now is not None else time.time()
    summary = {
        "exported_at": _dt.datetime.fromtimestamp(ts).isoformat(),
        "data_directory": data_dir,
        "statistics": stats,
    }
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    tmp = out_file + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        _json.dump(summary, f, ensure_ascii=False, indent=2)
    os.replace(tmp, out_file)
    return out_file


def gc_backups(
    backup_root: str,
    max_age_days: float,
    *,
    now: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete ``backup_*`` entries (dirs or archives) under ``backup_root``
    older than ``max_age_days`` (mtime-based — the reference's age GC).
    Returns the removed paths; ``dry_run`` lists without deleting."""
    if not os.path.isdir(backup_root):
        return []
    cutoff = (now if now is not None else time.time()) - max_age_days * 86400
    removed: list[str] = []
    for name in sorted(os.listdir(backup_root)):
        if not name.startswith(BACKUP_PREFIX):
            continue
        path = os.path.join(backup_root, name)
        if os.path.getmtime(path) >= cutoff:
            continue
        if not dry_run:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
        removed.append(path)
    return removed
