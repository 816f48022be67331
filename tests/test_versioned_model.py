"""Model-based randomized test of the versioned table's FULL
lifecycle: a seeded walk over write/append/merge/delete/compact/vacuum ops is
checked after every step against a pure-Python model (dict of version
-> row multiset).  Catches interaction bugs no single-op law can see —
e.g. merge after an append chain, vacuum after compact after merge,
dir reference counts across arbitrary histories."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from etl_dados_ibge_sp_spark.sinks.versioned import (append_version,
                                                     compact,
                                                     delete_where,
                                                     merge_version,
                                                     read_version,
                                                     vacuum,
                                                     write_version)

KEYS = range(10)


def _rows(rng, n):
    ks = rng.sample(list(KEYS), min(n, len(KEYS)))
    return [(k, rng.randrange(100)) for k in ks]


def _df(spark, rows):
    return spark.createDataFrame(rows or [(None, None)],
                                 "k int, v int").filter("k is not null")


def _multiset(df):
    return Counter((r.k, r.v) for r in df.collect())


@pytest.mark.parametrize("seed,pruned", [(20260815, False),
                                         (6021023, False),
                                         (77, True)])
def test_lifecycle_random_walk_matches_model(spark, tmp_path, seed,
                                             pruned):
    """``pruned=True`` additionally declares stats+bloom columns on
    every explicit write — with a RANDOM bloom_bits per write — and
    checks after every step that range pruning and bloom equality
    pruning are pure optimizations (same rows as unpruned+filter) for
    the CURRENT version and, at walk end, for every surviving version
    (time-travel pruning across arbitrary histories — the per-version
    bloom-bits law under every op interaction)."""
    rng = random.Random(seed)
    t = str(tmp_path / "tbl")
    model: dict[int, Counter] = {}
    current = None

    def check(version=None):
        v = current if version is None else version
        assert _multiset(read_version(spark, t, version=version)) == \
            model[v], f"divergence at version {v}"
        if not pruned:
            return
        key = rng.choice(list(KEYS))
        lo = rng.randrange(len(KEYS))
        want_eq = Counter({kv: c for kv, c in model[v].items()
                           if kv[0] == key})
        got_eq = _multiset(read_version(spark, t, version=version,
                                        prune_eq={"k": key})
                           .filter(f"k = {key}"))
        assert got_eq == want_eq, f"prune_eq divergence at v{v}"
        want_rg = Counter({kv: c for kv, c in model[v].items()
                           if kv[0] >= lo})
        got_rg = _multiset(read_version(spark, t, version=version,
                                        prune={"k": (lo, None)})
                           .filter(f"k >= {lo}"))
        assert got_rg == want_rg, f"prune divergence at v{v}"

    def _write_kwargs():
        if not pruned:
            return {}
        return {"stats_cols": ["k"], "bloom_cols": ["k"],
                "bloom_bits": rng.choice([1 << 8, 1 << 10, 1 << 13])}

    # Seed the table.
    rows = _rows(rng, 5)
    current = write_version(_df(spark, rows), t, **_write_kwargs())
    model[current] = Counter(rows)
    check()

    for step in range(24):
        op = rng.choice(["write", "append", "merge", "merge_del",
                         "compact", "vacuum", "delete", "delete"])
        if op == "write":
            rows = _rows(rng, rng.randrange(1, 8))
            current = write_version(_df(spark, rows), t,
                                    **_write_kwargs())
            model[current] = Counter(rows)
        elif op == "append":
            rows = _rows(rng, rng.randrange(1, 5))
            prev = model[current]
            current = append_version(_df(spark, rows), t)
            model[current] = prev + Counter(rows)
        elif op in ("merge", "merge_del"):
            ups = _rows(rng, rng.randrange(1, 6))
            dels = ([(k,) for k in
                     rng.sample(list(KEYS), rng.randrange(1, 4))]
                    if op == "merge_del" else None)
            state = {k: v for k, v in sorted(model[current].elements())}
            # merge_version ENFORCES key-unique sides (it raises on a
            # duplicate-key table, which appends legally create), so
            # the walk only merges when the contract holds.
            if sum(model[current].values()) != len(state):
                continue
            current = merge_version(
                spark, t, _df(spark, ups), keys=["k"],
                deletes=_df(spark, [(k, 0) for (k,) in dels])
                if dels else None)
            state.update(dict(ups))
            for (k,) in dels or []:
                state.pop(k, None)
            model[current] = Counter(state.items())
        elif op == "delete":
            # Merge-on-read predicate delete: the model removes the
            # matching rows from the CURRENT multiset; later appends
            # re-adding matching rows exercise the era semantics
            # (the walk's append steps compose on the post-delete
            # model, exactly like the engine's per-dir filters).
            if rng.random() < 0.5:
                cut = rng.randrange(len(KEYS))
                pred, fn = f"k >= {cut}", (lambda kv, c=cut:
                                           kv[0] >= c)
            else:
                cut = rng.randrange(100)
                pred, fn = f"v < {cut}", (lambda kv, c=cut: kv[1] < c)
            prevm = model[current]
            current = delete_where(spark, t, pred)
            model[current] = Counter({kv: c for kv, c in prevm.items()
                                      if not fn(kv)})
        elif op == "compact":
            v, _, _ = compact(spark, t, target_file_bytes=1 << 30)
            if v != current:  # folded an append chain into a new ver
                model[v] = model[current]
                current = v
        elif op == "vacuum":
            keep = rng.randrange(1, 4)
            vacuum(t, keep=keep)
            live = sorted(model, reverse=True)[:max(keep, 1)]
            model = {v: m for v, m in model.items()
                     if v in live or v == current}
        check()

    # Full-history check: every surviving version still reads exactly
    # its model multiset (time travel across the whole walk).
    for v in model:
        check(version=v)
