"""Distributed frequency sketches.

``heavy_hitters`` — Misra–Gries(k) heavy hitters over a token stream, the
mergeable-sketch pattern for 100 TB streams:

1. **partial** (map_batches): each batch builds an exact token-count table
   (Arrow dictionary encode + bincount — no Python per token) and compresses
   it to a Misra–Gries summary of at most ``k`` entries: subtract the
   (k+1)-th largest count from every entry and drop non-positives. The
   classic MG guarantee transfers: a token with true batch count ``c``
   retains residual ``>= c - B/(k+1)`` where ``B`` is the batch token count.
2. **merge**: summaries are summed with a bucketed two-phase aggregate —
   MG summaries are mergeable by addition-then-compress; we keep plain
   addition (a looser but still sound summary) so the merge stays a pure
   Arrow sum. Every token with true global frequency ``> N/(k+1)`` is
   guaranteed present (its residual is positive in at least the sum).
3. **recount**: the surviving candidate set (<= k per input block, tiny) is
   broadcast and an exact second pass counts only candidate tokens; the
   final filter ``count >= threshold`` makes the output EXACT for any
   threshold >= N/(k+1) — which is what makes the sketch DuckDB-oracle-able
   despite being a sketch.

The reference has no sketch machinery; this is the additive training-data
operator class ("novel sketch") from the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .aggregate import two_phase_aggregate


def _batch_token_counts(text: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Exact (token, count) for one batch, vectorized: Arrow whitespace split
    -> dictionary encode -> bincount over codes."""
    toks = pc.split_pattern_regex(pc.fill_null(text, ""), pattern=r"[\t\n\f\r ]+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    flat = flat.filter(pc.not_equal(flat, ""))
    if len(flat) == 0:
        return pa.array([], pa.string()), np.empty(0, np.int64)
    enc = pc.dictionary_encode(flat)
    counts = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                         minlength=len(enc.dictionary)).astype(np.int64)
    return enc.dictionary, counts


def mg_compress(tokens: pa.Array, counts: np.ndarray, k: int) -> tuple[pa.Array, np.ndarray]:
    """Misra–Gries compression to <= k entries: subtract the (k+1)-th largest
    count, drop non-positive residuals."""
    if len(counts) <= k:
        return tokens, counts
    kth = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    resid = counts - kth
    keep = resid > 0
    return tokens.filter(pa.array(keep)), resid[keep]


def heavy_hitters(ds, *, text_col: str = "text", k: int = 256,
                  threshold: int | None = None, num_buckets: int = 64):
    """Tokens with exact global frequency >= threshold, found via MG(k)
    partials + merged-summary candidates + exact recount. ``threshold`` must
    be >= N/(k+1) for the exactness guarantee (N = total token count); the
    default recount threshold is provided by the caller, typically a small
    absolute count. Returns (token, n) rows."""

    def partial(t: pa.Table) -> pa.Table:
        toks, counts = _batch_token_counts(t.column(text_col))
        toks, resid = mg_compress(toks, counts, k)
        return pa.table({"token": toks, "resid": pa.array(resid, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = two_phase_aggregate(partials, ["token"], [("resid", "sum", "resid")],
                                 num_buckets=num_buckets)

    def bucket_compress(t: pa.Table) -> pa.Table:
        # each merged block holds one bucket's disjoint token subset; MG-
        # compress it again so the global candidate set is bounded by
        # num_buckets * k NO MATTER the input size (without this the union
        # of per-batch summaries grows with batch count — a driver-side
        # collect would be the minhash round-1 mistake all over again)
        toks = t.column("token").combine_chunks()
        resid = t.column("resid").to_numpy(zero_copy_only=False)
        toks, resid = mg_compress(toks, resid, k)
        return pa.table({"token": toks, "resid": pa.array(resid, pa.int64())})

    merged = merged.map_batches(bucket_compress, batch_format="pyarrow", zero_copy_batch=True)
    # candidate set is now <= num_buckets * k rows — broadcast-class small
    cand = merged.map_batches(
        lambda t: t.select(["token"]), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cand_arr = pa.array(sorted(cand["token"].tolist()))
    ref = ray.put(cand_arr)

    def recount(t: pa.Table) -> pa.Table:
        cand_ = ray.get(ref)
        toks, counts = _batch_token_counts(t.column(text_col))
        keep = pc.is_in(toks, value_set=cand_).to_numpy(zero_copy_only=False)
        return pa.table({"token": toks.filter(pa.array(keep)),
                         "n": pa.array(counts[keep], pa.int64())})

    exact = two_phase_aggregate(
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True),
        ["token"], [("n", "sum", "n")], num_buckets=num_buckets,
    )
    if threshold is not None:
        exact = exact.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("n"), threshold)),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    return exact


def distinct_count_kmv(ds, *, k: int = 256, text_col: str = "text",
                       k_shingle: int = 3):
    """KMV (k-minimum-values) distinct-count sketch over the corpus's
    3-token shingles — vocabulary/n-gram cardinality estimation at stream
    scale. Unlike HLL, KMV under a FIXED hash is fully deterministic, so the
    estimate itself is DuckDB-oracle-able bit-for-bit.

    Estimator (Bar-Yossef et al. 2002): keep the k smallest distinct 64-bit
    shingle hashes; if fewer than k distinct values exist the count is
    exact, else est = (k-1) * 2^64 / h_(k), the classic unbiased KMV form.

    Scale shape: per-batch partial = k smallest distinct hashes (np.unique
    on the batch's shingle stream), so the merge input is <= batches*k rows
    — the same bounded-reduce argument as brute_force_topk. The merge is
    associative set-union-then-truncate, i.e. the sketch is mergeable; here
    a single final task unions the tiny partial set.
    """
    from .dedup import _batch_shingle_stream

    def partial(t: pa.Table) -> pa.Table:
        stream, _ = _batch_shingle_stream(
            t.column(text_col).combine_chunks()
            if isinstance(t.column(text_col), pa.ChunkedArray)
            else t.column(text_col), k_shingle)
        u = np.unique(stream)  # sorted ascending on the uint64 domain
        return pa.table({"h": pa.array(u[:k].view(np.int64))})

    def finalize(t: pa.Table) -> pa.Table:
        h = np.unique(t.column("h").to_numpy(zero_copy_only=False).view(np.uint64))
        kk = min(k, len(h))
        kth = int(h[kk - 1]) if kk else 0
        est = len(h) if len(h) < k else min((k - 1) * (1 << 64) // kth, (1 << 63) - 1)
        kth_signed = kth - (1 << 64) if kth >= (1 << 63) else kth
        return pa.table({"k": pa.array([k], pa.int64()),
                         "kth_hash": pa.array([kth_signed], pa.int64()),
                         "n_distinct_est": pa.array([est], pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.repartition(1).map_batches(finalize, batch_format="pyarrow",
                                               batch_size=None)


KMV_MIX = 0x9E3779B97F4A7C15  # golden-ratio odd multiplier (u64 permutation)


def grouped_kmv(ds, *, key: str, id_col: str, k: int = 64,
                num_buckets: int = 16):
    """Per-group KMV distinct-count sketch over an integer id column — the
    GROUPED mergeable-sketch shape (one sketch per key, merged by union +
    re-truncate), e.g. distinct users per event type without a global
    distinct shuffle.

    The hash is the fixed odd-multiplier u64 permutation
    ``h = id * KMV_MIX mod 2^64`` (same family as the minhash perms), so
    the k-th minimum — and therefore the estimate
    ``(k-1) * 2^64 // h_k`` (exact count when a group has < k distinct
    hashes) — is bit-exact against the DuckDB mirror.

    Scale shape: each batch emits at most k smallest distinct hashes per
    key it sees (the combiner), the bucketed reduce unions and re-truncates
    per key — shuffle volume is O(batches * keys * k), never the stream.
    """
    from .aggregate import grouped_apply

    mix = np.uint64(KMV_MIX)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ids * mix  # u64 wraparound = mod 2^64
        df = pd.DataFrame({key: t.column(key).to_numpy(zero_copy_only=False),
                           "h": h})
        df = df.drop_duplicates().sort_values([key, "h"], kind="mergesort")
        df = df.groupby(key, sort=False).head(k)
        return (pa.Table.from_pandas(df, preserve_index=False)
                .replace_schema_metadata(None))

    def per_bucket(g) -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        g = g.drop_duplicates([key, "h"]).sort_values([key, "h"],
                                                      kind="mergesort")
        rows = []
        for kv, s in g.groupby(key, sort=False)["h"]:
            hs = s.to_numpy()[:k]
            if len(hs) < k:
                est = len(hs)
            else:
                est = (k - 1) * (1 << 64) // int(hs[-1])
            rows.append((kv, len(hs), est))
        return pd.DataFrame(rows, columns=[key, "k_used", "n_distinct_est"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_apply(parts, [key], per_bucket, num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# HyperLogLog cardinality (Flajolet/Fusy/Gandouet/Meunier 2007)
# ---------------------------------------------------------------------------

HLL_P = 12                       # 2^12 = 4096 registers
HLL_RANK_BITS = 64 - HLL_P       # 52 suffix bits
HLL_RMAX = HLL_RANK_BITS + 1     # all-zero suffix rank


SPLITMIX_C1 = 0xBF58476D1CE4E5B9
SPLITMIX_C2 = 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """The splitmix64 finalizer (Steele/Lea/Flood 2014) — a full-avalanche
    u64 mixer, needed because HLL ranks read SUFFIX bits where the simple
    odd-multiplier permutation is badly non-uniform."""
    z = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(SPLITMIX_C1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(SPLITMIX_C2)
        return z ^ (z >> np.uint64(31))


def _mulmod64_sql(a: str, c: int) -> str:
    """``(a * c) mod 2^64`` for a < 2^64 in DuckDB HUGEINT without INT128
    overflow: split ``a`` into 32-bit halves so every product stays < 2^97
    (the established < 2^127 HUGEINT envelope)."""
    m, lo = 1 << 64, 1 << 32
    return (f"(({a} % {lo}::HUGEINT) * {c}::HUGEINT"
            f" + (({a} >> 32) * {c}::HUGEINT % {lo}::HUGEINT)"
            f" * {lo}::HUGEINT) % {m}::HUGEINT")


def splitmix64_sql(expr: str) -> str:
    """DuckDB mirror of :func:`splitmix64` — HUGEINT mod-2^64 arithmetic
    with xor/shift. ``expr`` should be a bare column reference (it is
    textually duplicated by the expansion)."""
    z0 = f"CAST({expr} AS HUGEINT)"
    z1 = _mulmod64_sql(f"xor({z0}, {z0} >> 30)", SPLITMIX_C1)
    z2 = _mulmod64_sql(f"xor({z1}, {z1} >> 27)", SPLITMIX_C2)
    return f"xor({z2}, {z2} >> 31)"


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (doubling method — no float
    log2, which mis-rounds at power-of-two boundaries)."""
    v = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v == 1)
    return bl


def hll_distinct(ds, *, id_col: str = "user_id", num_buckets: int = 16):
    """HyperLogLog distinct count over an integer id column — the
    industry-standard cardinality sketch, built with an EXACT integer core
    so the sketch itself (not just its inputs) is DuckDB-oracle-able:

    - ``h = splitmix64(id)`` (full-avalanche mixer — the odd-multiplier
      permutation's suffix bits are too structured for rank statistics);
    - register ``h >> 52``, rank = leading-zero count of the 52-bit suffix
      + 1 (all-zero suffix -> 53), merged by per-register max;
    - the harmonic sum is the exact integer ``S = sum 2^(53 - r)`` with
      r = 0 for never-touched registers, so the raw estimate
      ``alpha_m * m^2 * 2^53 / S`` is ONE float division of two exactly
      agreed values, and the small-range linear-counting branch
      (``raw <= 2.5m`` with empty registers -> ``m * ln(m / V)``) mirrors
      with a fixed expression order.

    Scale shape: per-batch distinct -> (register, rank) partials, one
    vocab-free two-phase max over <= 4096 keys; the driver folds 4096 rows.
    Output one row: (m, n_zero, s_hi, s_lo, est_e3) — S split into two
    exact int64 halves, estimate in milli-units.
    """
    import math

    import ray

    from .aggregate import two_phase_aggregate

    m = 1 << HLL_P

    def partial(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column(id_col).to_numpy(zero_copy_only=False)
                        .astype(np.uint64))
        h = splitmix64(ids)
        reg = (h >> np.uint64(HLL_RANK_BITS)).astype(np.int64)
        low = h & np.uint64((1 << HLL_RANK_BITS) - 1)
        rank = np.where(low == 0, HLL_RMAX,
                        HLL_RANK_BITS - _bit_length_u64(low) + 1)
        order = np.argsort(reg, kind="stable")
        reg, rank = reg[order], rank[order]
        starts = np.flatnonzero(np.r_[True, reg[1:] != reg[:-1]]) \
            if len(reg) else np.empty(0, np.int64)
        if len(reg):
            mx = np.maximum.reduceat(rank, starts)
            reg = reg[starts]
        else:
            mx = np.empty(0, np.int64)
        return pa.table({"reg": pa.array(reg), "r": pa.array(mx)})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    regs = two_phase_aggregate(parts, ["reg"], [("r", "max", "r")],
                               num_buckets=num_buckets)
    rows = regs.take_all()  # <= 4096 rows — bounded driver state
    ranks = np.array([row["r"] for row in rows], dtype=np.int64)
    n_zero = m - len(ranks)
    s = int(np.sum(1 << (HLL_RMAX - ranks))) + n_zero * (1 << HLL_RMAX)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * float(m) * float(m) * float(1 << HLL_RMAX) / float(s)
    if n_zero > 0 and raw <= 2.5 * m:
        est = float(m) * math.log(float(m) / n_zero)
    else:
        est = raw
    out = pa.table({
        "m": pa.array([m], pa.int64()),
        "n_zero": pa.array([n_zero], pa.int64()),
        "s_hi": pa.array([s >> 32], pa.int64()),
        "s_lo": pa.array([s & 0xFFFFFFFF], pa.int64()),
        "est_e3": pa.array([int(math.floor(est * 1000))], pa.int64()),
    })
    return ray.data.from_arrow(out)


def grouped_hll(ds, *, key: str = "event_type", id_col: str = "user_id",
                num_buckets: int = 16):
    """Per-group HyperLogLog — the GROUPED form of :func:`hll_distinct`
    (one register table per key, merged by per-(key, register) max): e.g.
    distinct users per event type at a constant 4096-registers-per-key
    memory bound, where grouped KMV keeps k hashes and exact distinct
    shuffles the stream.

    Same exact-integer core as the global sketch, so the per-group harmonic
    sums and estimates mirror bit-for-bit in SQL. Output one row per key:
    (key, n_zero, s_hi, s_lo, est_e3)."""
    import math

    from .aggregate import grouped_apply, two_phase_aggregate

    m = 1 << HLL_P

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        kv = t.column(key).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key: kv, "i": ids}).drop_duplicates()
        h = splitmix64(df["i"].to_numpy())
        reg = (h >> np.uint64(HLL_RANK_BITS)).astype(np.int64)
        low = h & np.uint64((1 << HLL_RANK_BITS) - 1)
        rank = np.where(low == 0, HLL_RMAX,
                        HLL_RANK_BITS - _bit_length_u64(low) + 1)
        out = (pd.DataFrame({key: df[key].to_numpy(), "reg": reg, "r": rank})
               .groupby([key, "reg"], sort=False)["r"].max().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False) \
                       .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    regs = two_phase_aggregate(parts, [key, "reg"], [("r", "max", "r")],
                               num_buckets=num_buckets)

    def fold(df) -> pa.Table:
        import pandas as pd

        rows = {key: [], "n_zero": [], "s_hi": [], "s_lo": [], "est_e3": []}
        for kval, g in df.groupby(key, sort=False):
            ranks = g["r"].to_numpy()
            n_zero = m - len(ranks)
            s = int(np.sum(1 << (HLL_RMAX - ranks))) + n_zero * (1 << HLL_RMAX)
            alpha = 0.7213 / (1.0 + 1.079 / m)
            raw = alpha * float(m) * float(m) * float(1 << HLL_RMAX) / float(s)
            est = (float(m) * math.log(float(m) / n_zero)
                   if n_zero > 0 and raw <= 2.5 * m else raw)
            rows[key].append(kval)
            rows["n_zero"].append(n_zero)
            rows["s_hi"].append(s >> 32)
            rows["s_lo"].append(s & 0xFFFFFFFF)
            rows["est_e3"].append(int(math.floor(est * 1000)))
        return pa.table({key: pa.array(rows[key]),
                         "n_zero": pa.array(rows["n_zero"], pa.int64()),
                         "s_hi": pa.array(rows["s_hi"], pa.int64()),
                         "s_lo": pa.array(rows["s_lo"], pa.int64()),
                         "est_e3": pa.array(rows["est_e3"], pa.int64())})

    return grouped_apply(regs, [key], fold)


def quantile_sketch(ds, *, value_col: str = "value",
                    permille: tuple = (500, 900, 990), bins: int = 4096,
                    num_buckets: int = 8):
    """Mergeable histogram quantile sketch — the 2-pass bounded-error
    alternative to the exact multi-pass bisection (window.global_quantiles)
    for 100 TB streams: pass 1 reduces to global (min, max, n) in cents;
    pass 2 bins every value into ``bins`` equal-width integer buckets
    (``(c - lo) * bins // (hi - lo + 1)`` — pure int arithmetic) and
    two-phase-sums the ≤``bins`` counts. The driver folds the cumulative
    histogram and reports, for each requested permille q, the bucket
    containing exact rank floor(q·(n−1)/1000) and its lower-bound estimate.
    Error ≤ one bucket width; everything is exact int64 so the SQL mirror
    agrees bit-for-bit.

    Output: (perm, bucket, est_lo_cents, rank) one row per quantile."""
    import pandas as pd

    from .aggregate import two_phase_aggregate

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()), 100.0), 0.5)),
            pa.int64())
        return pa.table({"c": c})

    cds = ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)

    def mm_part(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"k": pa.array([0], pa.int64()),
                         "lo": pa.array([int(c.min())], pa.int64()),
                         "hi": pa.array([int(c.max())], pa.int64()),
                         "n": pa.array([len(c)], pa.int64())})

    mm = two_phase_aggregate(
        cds.map_batches(mm_part, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["k"], [("lo", "min", "lo"), ("hi", "max", "hi"),
                ("n", "sum", "n")], num_buckets=2).take_all()[0]
    lo, hi, n = mm["lo"], mm["hi"], mm["n"]
    span = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        bk = (c - lo) * bins // span
        cnt = np.bincount(bk, minlength=bins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bk": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    h = two_phase_aggregate(
        cds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
        ["bk"], [("cnt", "sum", "cnt")], num_buckets=num_buckets).take_all()
    h.sort(key=lambda r: r["bk"])
    bks = np.array([r["bk"] for r in h], np.int64)
    cs = np.cumsum([r["cnt"] for r in h])
    out = []
    for perm in permille:
        rank = perm * (n - 1) // 1000
        i = int(np.searchsorted(cs, rank + 1))
        bk = int(bks[i])
        out.append({"perm": perm, "bucket": bk,
                    "est_lo_cents": lo + bk * span // bins, "rank": rank})
    return pd.DataFrame(out).astype(np.int64)


# ---------------------------------------------------------------------------
# count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_WIDTH_LOG2 = 8
CMS_DEPTH = 4


def cms_token_estimates(ds, *, width_log2: int = CMS_WIDTH_LOG2,
                        depth: int = CMS_DEPTH, top_v: int = 64,
                        text_col: str = "text", num_buckets: int = 8):
    """Count-min sketch over the whitespace-token stream, verified against
    exact counts: a ``depth`` x ``2^width_log2`` counter matrix built from
    per-batch partial token counts (md5 double hashing, position_r =
    (h1 + r*h2) mod width — the same SQL-mirrorable family as
    decontaminate_bloom), then the CMS point estimate (min over rows) for
    the ``top_v`` tokens by exact count, next to the truth. The CMS
    guarantee est >= true holds by construction; ``overestimate`` is the
    collision error the width/depth trade buys.

    Scale shape: the sketch exchange is depth*width bounded int rows no
    matter the vocabulary (each batch pre-collapses to distinct local
    tokens before hashing — the stream is never tokenized twice and no
    global token table feeds the sketch); the exact-count side rides the
    vocab-bounded two-phase + distributed top-V selection that
    unigram_logprob uses. Driver state: depth*width counters + top_v
    probe rows — constants."""
    from .dedup import _bloom_hashes
    from .textstats import split_tokens, top_v_counts, unigram_counts

    width = 1 << width_log2

    def sketch_partial(t: pa.Table) -> pa.Table:
        flat, _, _ = split_tokens(t.column(text_col))
        d = pc.dictionary_encode(flat)
        cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                          minlength=len(d.dictionary)).astype(np.int64)
        toks = d.dictionary.to_pylist()
        h1, h2 = _bloom_hashes(toks)
        rs, ps, vs = [], [], []
        for r in range(depth):
            rs.append(np.full(len(toks), r, np.int64))
            ps.append((h1 + r * h2) % width)
            vs.append(cnt)
        return pa.table({"r": pa.array(np.concatenate(rs) if rs else
                                       np.zeros(0, np.int64)),
                         "p": pa.array(np.concatenate(ps) if ps else
                                       np.zeros(0, np.int64)),
                         "v": pa.array(np.concatenate(vs) if vs else
                                       np.zeros(0, np.int64))})

    parts = ds.map_batches(sketch_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    counters = two_phase_aggregate(parts, ["r", "p"], [("v", "sum", "v")],
                                   num_buckets=num_buckets).take_all()
    mat = np.zeros((depth, width), np.int64)
    for row in counters:
        mat[row["r"], row["p"]] = row["v"]

    exact = unigram_counts(ds, text_col=text_col).materialize()
    if exact.count() > top_v:
        exact = top_v_counts(exact, key_col="tok", count_col="c", top_v=top_v)
    probe = exact.take_all()
    toks = [r["tok"] for r in probe]
    true = np.array([r["c"] for r in probe], np.int64)
    h1, h2 = _bloom_hashes(toks)
    est = np.full(len(toks), np.iinfo(np.int64).max, np.int64)
    for r in range(depth):
        est = np.minimum(est, mat[r, (h1 + r * h2) % width])
    return pa.table({"token": pa.array([str(t) for t in toks]),
                     "cms_estimate": pa.array(est),
                     "true_count": pa.array(true),
                     "overestimate": pa.array(est - true)})
