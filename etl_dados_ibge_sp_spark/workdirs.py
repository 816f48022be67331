"""Bounded, deterministic scratch directories — the repo-wide
convention for any query/operator that must materialize files.

``tempfile.mkdtemp`` per invocation is the anti-pattern this module
retires: bench warm+timed runs, parity tests, and driver rounds invoke
each registered query repeatedly, so a fresh dir per call accumulates
without bound (measured: 1,598 orphan dirs / 648 MB in one session's
/tmp before the round-8 sweep — a long-lived driver at real scale
fills its disk with exactly this pattern).  ``fresh_work_dir`` instead
gives every (site, key) ONE deterministic dir, cleared at the START of
the next call — so a full bench + pytest run leaves a bounded,
enumerable set of scratch dirs, pinned by tests/test_workdir_hygiene.

Package-internal ``mkdtemp`` remains legitimate only where the caller
deletes the dir in a ``finally`` before returning (the allowlist the
hygiene test enforces).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile


def work_root() -> str:
    """Per-user parent for all scratch dirs.  Scoping by uid keeps two
    users on a shared host from clobbering each other's live trees or
    colliding on permissions (the fixed shared-path flaw of the first
    revision); mode 0700 keeps the tree private."""
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    root = os.path.join(tempfile.gettempdir(), f"etl_ibge_work_{uid}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    return root


def fresh_work_dir(name: str, key: str) -> str:
    """Deterministic per-(name, key) scratch dir, cleared on entry.

    Callers whose RESULT lazily reads from the tree rely on the clear
    happening at the start of the NEXT call, never at exit — so the
    contract is: materialize the previous result before invoking the
    same (name, key) again.  Two CONCURRENT invocations of the same
    (name, key) are out of contract (same as two writers on one
    versioned-table dir); different users never collide because the
    parent is uid-scoped.

    A pre-existing foreign file or symlink at the path is removed
    rather than tripping ``makedirs`` (it can only be the same user's
    debris — the parent is 0700), and creation tolerates the
    benign recreate race with ``exist_ok``.
    """
    tag = hashlib.md5(key.encode()).hexdigest()[:12]
    path = os.path.join(work_root(), f"{name}_{tag}")
    if os.path.islink(path) or os.path.isfile(path):
        os.unlink(path)  # rmtree refuses non-dirs; clear it explicitly
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


# Generated scale datasets (tools/make_scale_data.py) live under the
# work root as sf<factor>/ dirs.  Retention policy: ONLY these may
# persist between sessions — they are regenerate-on-demand artifacts
# (sf1.0 rebuilds in ~1 min, sf3.0 in ~3; the generator is
# deterministic, so deleting them loses nothing), kept only because
# the per-round scale curve re-measures against them.  Anything else
# matching sf* is debris and prune_scale_data() sweeps it.  The
# hygiene suite (tests/test_workdir_hygiene.py) pins the bound.
SCALE_DATA_KEEP = ("sf1.0", "sf3.0")


def scale_data_dirs() -> list[str]:
    """The sf*/ dataset dirs currently present under the work root."""
    root = work_root()
    return sorted(d for d in os.listdir(root)
                  if d.startswith("sf")
                  and os.path.isdir(os.path.join(root, d)))


def prune_scale_data() -> list[str]:
    """Remove generated scale-data dirs outside SCALE_DATA_KEEP;
    returns what was removed.  Safe by construction: only dirs named
    sf* directly under the uid-scoped work root are candidates, and
    every one is a deterministic regenerate-on-demand artifact."""
    removed = []
    root = work_root()
    for d in scale_data_dirs():
        if d not in SCALE_DATA_KEEP:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            removed.append(d)
    return removed


def package_zip() -> str:
    """Zip of this package for ``addPyFile``, CONTENT-KEYED and built
    at most once per package version per uid.

    Why not mkdtemp-and-forget (the old pattern, one leaked dir per
    session) or build-and-delete: executors fetch the addPyFile source
    LAZILY at first task and verify its bytes on every re-fetch, so
    the file must (a) outlive the session and (b) never change bytes
    while any session references it.  Content-keying gives both: a
    code edit lands at a NEW path while running sessions keep theirs,
    and the zip bytes are fully deterministic (sorted .py walk, zeroed
    timestamps, no __pycache__), so even two sessions racing the first
    build write identical bytes."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.basename(pkg_dir)
    h = hashlib.md5()
    blobs: list[tuple[str, bytes]] = []
    for dirpath, dirs, names in os.walk(pkg_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for n in sorted(names):
            if not n.endswith(".py"):
                continue
            full = os.path.join(dirpath, n)
            rel = os.path.relpath(full, pkg_dir)
            with open(full, "rb") as fh:
                data = fh.read()
            h.update(rel.encode())
            h.update(b"\0")
            h.update(data)
            blobs.append((rel, data))
    out = os.path.join(work_root(),
                       f"{base}_{h.hexdigest()[:16]}.zip")
    if os.path.exists(out):
        return out
    fd, tmp = tempfile.mkstemp(dir=work_root(), suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, data in blobs:
            zi = zipfile.ZipInfo(f"{base}/{rel}",
                                 date_time=(1980, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data)
    os.replace(tmp, out)  # atomic: readers only ever see a full zip
    return out
