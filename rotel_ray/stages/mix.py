"""Corpus mixing and training-export operators.

``mix_balance`` — source re-mixing to an equal token share: the step that
turns a crawl dominated by a few giant sources into the balanced training
mix (cf. the sampling-weight rebalancing in Gopher/DoReMi-style data
recipes). Every source gets the same token budget (corpus_total /
(share_div * n_sources)); sources over their share are down-sampled
deterministically (md5-prefix threshold — a pure content function, no RNG
state), sources under it keep everything. All thresholds are integers
derived from the aggregated totals, so the DuckDB oracle is bit-exact.

``shard_assign`` — the deterministic global shuffle + shard step of a
training-data export: shard = h(text) mod n_shards, position = rank within
the shard by (h, doc_id). Equivalent to ORDER BY md5(text) sharding — a
reproducible "random" order that is a pure function of content, so a
re-run (or a resumed run) lands every row in the same shard file at the
same position.

Scale shape: ``mix_balance`` is one two-phase aggregate (n_sources partial
rows per batch) + a tiny driver-side threshold table broadcast into a
fused filter — the corpus itself never shuffles. ``shard_assign`` is ONE
bucketed shuffle on the shard id; ranking within a shard is a single
lexsort over the md5 keys (fixed-width S32 bytes, not Python strings).
At 100 TB, n_shards scales with the corpus and each shard is written as
its own partition directory (``write_parquet(partition_cols=["shard"])``),
so a failed export resumes per shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_apply, two_phase_aggregate
from .enrich import _hash_values

HEX_WEIGHTS = np.array([4096, 256, 16, 1], np.int64)


def _hex4_to_int(arr: pa.Array) -> np.ndarray:
    """Parse a fixed-width 4-hex-char lowercase column (md5 prefix) to int64,
    vectorized over the Arrow byte buffer."""
    s = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(s)
    if n == 0:
        return np.empty(0, np.int64)
    if pa.types.is_large_string(s.type):
        s = pc.cast(s, pa.string())
    offs = np.frombuffer(s.buffers()[1], np.int32)[s.offset : s.offset + n + 1]
    data = np.frombuffer(s.buffers()[2], np.uint8)
    idx = offs[:-1].astype(np.int64)[:, None] + np.arange(4)
    chars = data[idx].astype(np.int64)
    return np.where(chars >= ord("a"), chars - 87, chars - 48) @ HEX_WEIGHTS


def mix_balance(ds, *, source_col: str = "source", text_col: str = "text",
                id_col: str = "doc_id", share_div: int = 2,
                num_buckets: int = 64):
    """Keep each doc iff md5_prefix16(text) < thr[source], where
    thr = min(2^16, budget * 2^16 // source_tokens) and
    budget = corpus_tokens // (share_div * n_sources)."""

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table({
            source_col: t.column(source_col),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column(text_col).combine_chunks(), r"\S+"),
                pa.int64()),
        })

    totals = two_phase_aggregate(
        ds.map_batches(count_tokens, batch_format="pyarrow", zero_copy_batch=True),
        [source_col], [("n_tokens", "sum", "t")], num_buckets=num_buckets,
    ).take_all()  # n_sources rows — the broadcast side, never the corpus
    corpus = sum(r["t"] for r in totals)
    budget = corpus // (share_div * max(len(totals), 1))
    keys = pa.array([r[source_col] for r in totals])
    vals = pa.array(
        [min(65536, budget * 65536 // r["t"]) if r["t"] else 65536 for r in totals],
        pa.int64())

    def keep(t: pa.Table) -> pa.Table:
        h4 = pc.utf8_slice_codeunits(_hash_values(t.column(text_col), "md5"), 0, 4)
        pref = _hex4_to_int(h4)
        tnum = pc.fill_null(
            pc.take(vals, pc.index_in(t.column(source_col).combine_chunks(), keys)), 0
        ).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pref < tnum)).select([id_col, source_col])

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def shard_assign(ds, *, n_shards: int = 16, id_col: str = "doc_id",
                 text_col: str = "text", num_buckets: int = 64):
    """(doc_id, shard, pos): shard = md5_prefix16(text) mod n_shards, pos =
    rank within the shard ordered by (md5(text), doc_id)."""

    def prep(t: pa.Table) -> pa.Table:
        hh = _hash_values(t.column(text_col), "md5")
        shard = _hex4_to_int(pc.utf8_slice_codeunits(hh, 0, 4)) % n_shards
        return pa.table({id_col: t.column(id_col), "__h": hh,
                         "shard": pa.array(shard.astype(np.int64))})

    def rank(t: pa.Table) -> pa.Table:
        sh = t.column("shard").to_numpy(zero_copy_only=False)
        d = t.column(id_col).to_numpy(zero_copy_only=False)
        # md5 hex is fixed 32 ASCII chars: sort as S32 bytes, not objects
        h = t.column("__h").to_numpy(zero_copy_only=False).astype("S32")
        order = np.lexsort((d, h, sh))
        sh_s = sh[order]
        starts = np.flatnonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])
        seg = np.repeat(starts, np.diff(np.r_[starts, len(sh_s)]))
        return pa.table({
            id_col: pa.array(d[order]),
            "shard": pa.array(sh_s),
            "pos": pa.array(np.arange(len(sh_s)) - seg),
        })

    rows = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(rows, ["shard"], rank, batch_format="pyarrow",
                         num_buckets=min(num_buckets, n_shards))


def token_budget_sample(ds, budget: int, *, id_col: str = "doc_id",
                        text_col: str = "text", num_buckets: int = 64):
    """Exact token-budget subsample: walk the corpus in the deterministic
    uniform order ``(md5(text), doc_id)`` and keep the prefix of documents
    whose EXCLUSIVE cumulative token count is still below ``budget`` (the
    "give me exactly ~N tokens, sampled uniformly, reproducibly" selector;
    the crossing doc is kept, so the kept mass is the least >= budget
    unless the corpus is smaller).

    Scale shape — the seq_pack prefix-sum re-keyed by hash order:

    1. one pass reduces each doc to (id, md5, n_tokens, range), where
       ``range`` = first 4 hex chars of the hash (65536 value-ordered
       ranges, bounded driver state);
    2. per-range token totals via the generic two-phase aggregate; the
       driver exclusive-cumsums them in range order and broadcasts the base
       table; ranges whose base already exceeds the budget contribute
       nothing downstream;
    3. a bucketed ``grouped_apply`` over the range key sorts each range by
       (md5, id), adds the range base to the within-range running sum, and
       keeps rows with ``cum_before < budget`` — selection happens inside
       the reduce task.

    Output: (id_col, n_tokens, cum_before), exact int64.
    """
    import ray

    from .tokenize import split_tokens

    def prep(t: pa.Table) -> pa.Table:
        _, _, n = split_tokens(t.column(text_col))
        hh = _hash_values(t.column(text_col), "md5")
        rk = _hex4_to_int(pc.utf8_slice_codeunits(hh, 0, 4))
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         "__h": hh, "__rk": pa.array(rk.astype(np.int64)),
                         "n_tokens": pa.array(n)})

    narrow = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    totals = two_phase_aggregate(narrow, ["__rk"],
                                 [("n_tokens", "sum", "tot")],
                                 num_buckets=num_buckets)
    rows = totals.take_all()  # <= 65536 rows
    rk = np.array([r["__rk"] for r in rows], dtype=np.int64)
    tot = np.array([r["tot"] for r in rows], dtype=np.int64)
    order = np.argsort(rk, kind="stable")
    rk, tot = rk[order], tot[order]
    base = np.concatenate(([0], np.cumsum(tot)[:-1]))
    base_ref = ray.put((rk, base))

    def per_bucket(t: pa.Table) -> pa.Table:
        rks, bases = ray.get(base_ref)
        key = t.column("__rk").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = t.column("__h").to_numpy(zero_copy_only=False).astype("S32")
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, h, key))
        key, ids, n = key[o], ids[o], n[o]
        cs = np.cumsum(n) - n
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        cs = cs - np.repeat(cs[starts], np.diff(np.r_[starts, len(n)]))
        cum_before = bases[np.searchsorted(rks, key)] + cs
        keep = cum_before < budget
        return pa.table({id_col: pa.array(ids[keep]),
                         "n_tokens": pa.array(n[keep]),
                         "cum_before": pa.array(cum_before[keep])})

    return grouped_apply(narrow, ["__rk"], per_bucket, batch_format="pyarrow",
                         num_buckets=num_buckets)


def weighted_sample(ds, k: int, *, id_col: str = "doc_id",
                    weight_col: str = "n_chars", text_col: str | None = None):
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis (2006) exponential-keys algorithm, the standard
    one-pass distributed weighted sampler: each row gets the key
    ``u^(1/w)`` (equivalently ``ln(u)/w``) with ``u`` a content-hash
    uniform in (0,1), and the global top-k keys ARE a weighted sample
    without replacement.

    Determinism + exactness: ``u = (splitmix64(id) + 1) / 2^64`` (pure
    function of the row, no RNG state), the key is evaluated with ONE
    fixed float expression (``ln(u) / w``, larger is better) and the
    selection is integer-tie-free (distinct hashes), so the DuckDB mirror
    selects the identical k rows. Scale shape: stateless key pass ->
    per-batch partial top-k -> global sort of batches*k rows -> limit."""
    from .sketch import splitmix64

    def keys(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        w = np.maximum(t.column(weight_col).to_numpy(zero_copy_only=False)
                       .astype(np.float64), 1.0)
        key = np.log(u) / w  # monotone in u^(1/w); larger = better
        return pa.table({id_col: pc.cast(t.column(id_col), pa.int64()),
                         weight_col: t.column(weight_col),
                         "es_key_unat": pa.array(
                             np.floor(key * 1e9).astype(np.int64))})

    def partial_topk(t: pa.Table) -> pa.Table:
        kv = t.column("es_key_unat").to_numpy(zero_copy_only=False)
        if len(kv) > k:
            idx = np.argpartition(-kv, k)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    scored = ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
    return (scored.map_batches(partial_topk, batch_format="pyarrow",
                               zero_copy_batch=True)
            .sort(["es_key_unat", id_col], descending=[True, False]).limit(k))


def docs_v2_path(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Pure cache path (reads only the source footer; never builds)."""
    import os

    from ..generator import sf_from_dir

    from .planted import source_tag

    tag = source_tag(f"{sf_dir}/documents.parquet")
    return os.path.join(root, f"docs_v2_g2_sf{sf_from_dir(sf_dir):g}_{tag}")


def ensure_docs_v2(sf_dir: str, root: str = "/tmp/rotel_ray_data") -> str:
    """Deterministic 'next snapshot' of the documents table — the corpus-
    versioning fixture: drops every doc with doc_id % 7 == 3, rewrites the
    text of every doc_id % 11 == 5 (recrawl drift), and adds one new doc
    per source (ids 5_000_000+). Pure function of the input, cached with
    the usual atomic rename."""
    import os
    import shutil

    import pyarrow.parquet as pq

    out = docs_v2_path(sf_dir, root)
    if os.path.isdir(out) and os.listdir(out):
        return out
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    keep = ids % 7 != 3
    t = t.filter(pa.array(keep))
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    text = np.asarray(t.column("text").to_pylist(), dtype=object)
    mod = ids % 11 == 5
    text[mod] = np.char.add(text[mod].astype(str), " recrawl v2")
    t = t.set_column(t.column_names.index("text"), "text",
                     pa.array(text.astype(str)))
    srcs = sorted(set(t.column("source").to_pylist()))
    extra = pa.table({
        "doc_id": pa.array([5_000_000 + i for i in range(len(srcs))], pa.int64()),
        "text": pa.array([f"new snapshot doc for {s}" for s in srcs]),
        "lang": pa.array(["en"] * len(srcs)),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(f"new snapshot doc for {s}") for s in srcs],
                            pa.int64()),
    })
    t = pa.concat_tables([t.select(extra.column_names), extra])
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t.replace_schema_metadata(None),
                   os.path.join(tmp, "part-0000.parquet"))
    try:
        os.replace(tmp, out)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def corpus_diff(v1_ds, v2_ds, *, id_col: str = "doc_id",
                text_col: str = "text", num_buckets: int = 64):
    """Snapshot diff between two corpus versions — the incremental-ingest
    primitive: every doc id is classified added (v2 only) / removed (v1
    only) / changed (both, content hash differs) / unchanged. One tagged
    hash-bucketed shuffle on the id (rows carry (id, md5, side) only, never
    the text); per bucket a vectorized pandas pivot assigns the status."""
    import pandas as pd

    from .aggregate import grouped_apply
    from .enrich import _hash_values

    def prep(side: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: pc.cast(t.column(id_col), pa.int64()),
                "__h": _hash_values(t.column(text_col), "md5"),
                "__side": pa.nulls(t.num_rows, pa.int8()).fill_null(side),
            })
        return f

    both = v1_ds.map_batches(prep(1), batch_format="pyarrow",
                             zero_copy_batch=True).union(
        v2_ds.map_batches(prep(2), batch_format="pyarrow", zero_copy_batch=True))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index=id_col, columns="__side", values="__h",
                           aggfunc="first")
        h1 = p[1] if 1 in p.columns else pd.Series(index=p.index, dtype=object)
        h2 = p[2] if 2 in p.columns else pd.Series(index=p.index, dtype=object)
        status = np.where(h1.isna(), "added",
                          np.where(h2.isna(), "removed",
                                   np.where(h1 == h2, "unchanged", "changed")))
        return pd.DataFrame({id_col: p.index.to_numpy(),
                             "status": status})

    return grouped_apply(both, [id_col], per_bucket, num_buckets=num_buckets)


SPLIT_BOUNDS = (90, 95)  # train < 90, val < 95, test otherwise (of 100)


def conv_split(ds, *, key: str = "conv_id", bounds: tuple[int, int] = SPLIT_BOUNDS):
    """Leakage-safe train/val/test assignment by GROUP, not by row: every
    turn of a conversation lands in the same split because membership is a
    pure function of the group key — ``int(md5(key)[-2:], 16) % 100`` into
    train/val/test bands. No RNG state, no coordination, re-runnable on any
    subset (the group-aware analogue of doc_sample's hash sampling).

    Stateless one-pass map; the 2-hex-digit parse is vectorized over the
    <= 256 DISTINCT suffixes via dictionary encoding."""
    from .enrich import _hash_values

    lo, hi = bounds

    def f(t: pa.Table) -> pa.Table:
        h = _hash_values(t.column(key), "md5")
        suf = pc.dictionary_encode(pc.utf8_slice_codeunits(h, 30, 32))
        lut = np.array([int(s, 16) % 100 for s in suf.dictionary.to_pylist()],
                       dtype=np.int64)
        b = lut[suf.indices.to_numpy(zero_copy_only=False)]
        split = np.where(b < lo, "train", np.where(b < hi, "val", "test"))
        return t.append_column("split", pa.array(split.astype(object), pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mix_temperature(ds, *, tau: float = 0.7, source_col: str = "source",
                    text_col: str = "text", num_buckets: int = 64):
    """Temperature-based source re-weighting — the multilingual/Gopher
    sampling recipe (XLM/mT5 convention): target share q_i ∝ p_i^tau
    where p_i is the source's natural token share (tau=1 keeps the natural
    mix, tau→0 approaches uniform; mT5 uses tau=0.3, XLM 0.5-0.7). Emits the per-source weight table a training
    loader consumes: natural share, temperature weight, target share, and
    the over/under-sampling boost factor.

    Exactness: p_i^tau is computed as exp(ln(t/corpus)*tau) and
    floor-quantized to integer nano-units ONCE; every downstream column is
    pure integer arithmetic on those ints, so the DuckDB oracle is
    bit-exact (the ln/exp/floor bit-agreement pattern the LM-score oracles
    use). Scale shape: one two-phase aggregate (n_sources partial rows per
    batch); the corpus never shuffles and the driver sees n_sources rows."""
    import math

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table({
            source_col: t.column(source_col),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column(text_col).combine_chunks(),
                                         r"\S+"), pa.int64()),
        })

    totals = two_phase_aggregate(
        ds.map_batches(count_tokens, batch_format="pyarrow",
                       zero_copy_batch=True),
        [source_col], [("n_tokens", "sum", "t")], num_buckets=num_buckets,
    ).take_all()  # n_sources rows — never the corpus
    corpus = sum(r["t"] for r in totals)
    rows = []
    for r in sorted(totals, key=lambda r: r[source_col]):
        t = r["t"]
        w = int(math.floor(math.exp(math.log(t / corpus) * tau) * 1e9)) \
            if t else 0
        rows.append((r[source_col], t, t * 10**9 // corpus, w))
    sum_w = sum(w for *_, w in rows)
    return pa.table({
        source_col: pa.array([s for s, *_ in rows]),
        "n_tokens": pa.array([t for _, t, *_ in rows], pa.int64()),
        "share_unat": pa.array([sh for _, _, sh, _ in rows], pa.int64()),
        "temp_w_unat": pa.array([w for *_, w in rows], pa.int64()),
        "target_unat": pa.array([w * 10**9 // sum_w for *_, w in rows],
                                pa.int64()),
        "boost_ppm": pa.array(
            [w * corpus * 10**6 // (sum_w * t) if t else 0
             for _, t, _, w in rows], pa.int64()),
    })


def per_source_cap(ds, cap: int, *, source_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   num_buckets: int = 64):
    """Per-source document cap — the "at most N pages per domain" crawl
    rule: within each source keep the first ``cap`` docs in the
    deterministic uniform order (md5(text), doc_id) (same reproducible
    pseudo-random order as shard_assign, so re-runs keep identical docs).

    Scale shape: one stateless pass reduces each row to
    (id, source, md5) — text never shuffles — AND pre-truncates to the
    ``cap`` smallest (md5, id) rows per source per batch (the global
    first-cap set is a subset of the union of per-batch first-cap sets,
    the same phase-1 combiner as window.topk_per_group). The shuffle is
    therefore bounded at batches x cap rows per source even when one
    mega-domain dominates the crawl; each bucket then finishes with one
    vectorized sorted scan. Output: (id_col, source_col, rank)."""

    def prep(t: pa.Table) -> pa.Table:
        return _cap_select(pa.table({
            id_col: t.column(id_col),
            source_col: t.column(source_col),
            "__h": _hash_values(t.column(text_col), "md5"),
        }), cap, id_col=id_col, source_col=source_col, final=False)

    narrow = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    return grouped_apply(
        narrow, [source_col],
        lambda t: _cap_select(t, cap, id_col=id_col, source_col=source_col,
                              final=True),
        batch_format="pyarrow", num_buckets=num_buckets)


def _cap_select(t: pa.Table, cap: int, *, id_col: str, source_col: str,
                final: bool) -> pa.Table:
    """Keep the ``cap`` smallest (md5, id) rows per source of ``t`` — one
    lexsort + segment-rank scan, vectorized across all sources at once.
    Used twice by per_source_cap: per batch as the bounding combiner
    (final=False: ranks are batch-local, so only the key survives) and per
    bucket as the finisher (final=True: ranks are now global, emit them)."""
    src = t.column(source_col).to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    h = t.column("__h").to_numpy(zero_copy_only=False).astype("S32")
    order = np.lexsort((ids, h, src))
    s_s, i_s, h_s = src[order], ids[order], h[order]
    starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]]) \
        if len(s_s) else np.empty(0, np.int64)
    seg = np.repeat(starts, np.diff(np.r_[starts, len(s_s)])) \
        if len(s_s) else np.empty(0, np.int64)
    rank = np.arange(len(s_s)) - seg
    keep = rank < cap
    cols = {id_col: pa.array(i_s[keep]), source_col: pa.array(s_s[keep])}
    if final:
        cols["rank"] = pa.array(rank[keep].astype(np.int64))
    else:
        cols["__h"] = pa.array(np.char.decode(h_s[keep], "ascii"))
    return pa.table(cols)


ALLOC_BUDGET = 1_000_000


def fair_allocation(ds, *, source_col: str = "source",
                    text_col: str = "text", budget: int = ALLOC_BUDGET,
                    num_buckets: int = 8):
    """Largest-remainder (Hamilton) apportionment of a sampling budget
    across sources, weighted by whitespace-token mass: every source gets
    floor(budget · w/W), and the leftover seats go to the largest
    remainders (ties broken by source name ascending) — the deterministic
    integer allocation a mixture sampler needs so per-source quotas sum
    EXACTLY to the budget (proportional rounding never does).

    Scale shape: one two-phase per-source token sum over the corpus; the
    apportionment runs on the driver over |sources| rows in Python ints
    (no overflow at any corpus size)."""
    from .aggregate import two_phase_aggregate

    def toks(t: pa.Table) -> pa.Table:
        return pa.table({
            source_col: t.column(source_col),
            "n": pc.cast(pc.count_substring_regex(
                t.column(text_col).combine_chunks(), r"\S+"), pa.int64()),
        })

    sums = two_phase_aggregate(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        [source_col], [("n", "sum", "n_tokens")],
        num_buckets=num_buckets).take_all()
    rows = sorted(sums, key=lambda r: r[source_col])
    W = sum(int(r["n_tokens"]) for r in rows)
    if W == 0:
        return pa.table({source_col: pa.array([r[source_col] for r in rows]),
                         "n_tokens": pa.array([0] * len(rows), pa.int64()),
                         "alloc": pa.array([0] * len(rows), pa.int64())})
    base = [budget * int(r["n_tokens"]) // W for r in rows]
    rem = [budget * int(r["n_tokens"]) % W for r in rows]
    leftover = budget - sum(base)
    order = sorted(range(len(rows)), key=lambda i: (-rem[i], rows[i][source_col]))
    alloc = list(base)
    for i in order[:leftover]:
        alloc[i] += 1
    return pa.table({source_col: pa.array([r[source_col] for r in rows]),
                     "n_tokens": pa.array([int(r["n_tokens"]) for r in rows],
                                          pa.int64()),
                     "alloc": pa.array(alloc, pa.int64())})


CDC_FIELDS = ("text", "lang", "source", "n_chars")


def cdc_field_diff(v1, v2, *, id_col: str = "doc_id",
                   fields: tuple = CDC_FIELDS, num_buckets: int = 64):
    """Field-level CDC diff between two corpus snapshots: for every doc
    id present in BOTH versions, which fields changed — the
    column-granular companion to corpus_diff's row-level add/remove/mod
    view (e.g. a recrawl that rewrites text but forgets to refresh
    n_chars shows up here as text≠ / n_chars=). Output one row per
    field: (field, n_common, n_changed).

    Scale shape: text is replaced by its md5 on the map side (raw text
    never shuffles); one bucketed id join, one global flag reduce; the
    unpivot runs on the |fields|-row driver result."""
    from .dedup import _hash_values
    from .aggregate import two_phase_aggregate
    from .join import bucket_hash_join

    def prep(suffix: str):
        def f(t: pa.Table) -> pa.Table:
            cols = {id_col: t.column(id_col),
                    "text" + suffix: _hash_values(t.column("text"), "md5")}
            for c in fields:
                if c != "text":
                    cols[c + suffix] = t.column(c)
            return pa.table(cols)
        return f

    a = v1.map_batches(prep("_a"), batch_format="pyarrow",
                       zero_copy_batch=True)
    b = v2.map_batches(prep("_b"), batch_format="pyarrow",
                       zero_copy_batch=True)
    j = bucket_hash_join(a, b, on=id_col, num_buckets=num_buckets)

    def flags(t: pa.Table) -> pa.Table:
        cols = {"g": pa.array(np.zeros(t.num_rows, np.int64)),
                "n_common": pa.array(np.ones(t.num_rows, np.int64))}
        for c in fields:
            cols["chg_" + c] = pc.cast(
                pc.not_equal(t.column(c + "_a"), t.column(c + "_b")),
                pa.int64())
        return pa.table(cols)

    sums = two_phase_aggregate(
        j.map_batches(flags, batch_format="pyarrow", zero_copy_batch=True),
        ["g"], [("n_common", "sum", "n_common")]
        + [("chg_" + c, "sum", "chg_" + c) for c in fields],
        num_buckets=2).take_all()
    r = sums[0] if sums else {"n_common": 0,
                              **{"chg_" + c: 0 for c in fields}}
    return pa.table({
        "field": pa.array(list(fields), pa.string()),
        "n_common": pa.array([int(r["n_common"])] * len(fields), pa.int64()),
        "n_changed": pa.array([int(r["chg_" + c]) for c in fields],
                              pa.int64())})


def mix_entropy(ds, *, source_col: str = "source", text_col: str = "text",
                num_buckets: int = 8):
    """Mixture-entropy diagnostic of the corpus source distribution by
    TOKEN mass (not doc count — long sources dominate training): one row
    (n_sources, n_tokens, ent_unat) with

        ent_unat = Σ_s c_s · floor(ln(N / c_s) · 1e6)

    exact int64 micro-nats (the char_entropy floor-absorbs-ulp
    convention; exp(ent_unat / N / 1e6) downstream is the effective
    source count). Map-side regex token counts pre-combine per batch;
    the finisher sees one row per source."""
    from .aggregate import two_phase_aggregate

    def prep(t: pa.Table) -> pa.Table:
        toks = pc.cast(pc.count_substring_regex(t.column(text_col),
                                                pattern=r"\S+"), pa.int64())
        return pa.table({source_col: t.column(source_col), "toks": toks})

    agg = two_phase_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [source_col], [("toks", "sum", "c")], num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(c.sum())
        terms = c * np.floor(
            np.log(np.float64(n) / c) * 1e6).astype(np.int64)
        return pa.table({
            "n_sources": pa.array([len(c)], pa.int64()),
            "n_tokens": pa.array([n], pa.int64()),
            "ent_unat": pa.array([int(terms.sum())], pa.int64())})

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow",
                                          zero_copy_batch=True)
