"""Deterministic sampling operators for training-data pipelines.

Data mixing needs samples that are *reproducible across runs and
engines* — no RNG state, no partition-order dependence. Both operators
key randomness off md5 of a stable id, so the same corpus always yields
the same sample on any cluster size (and the DuckDB oracle can replay
it exactly).

Scale notes (100 TB):
- ``hash_sample`` is a pure filter — pushed to the scan, no shuffle,
  trivially parallel. This is the right tool for "take 1% of the
  corpus" at any scale.
- ``stratified_sample`` shuffles once on the strata key and ranks
  within each stratum. For pathological strata (one lang = 90% of the
  corpus) the sort-per-stratum dominates; pre-thin with ``hash_sample``
  at a fraction that still guarantees ≥ k survivors per stratum, then
  rank the survivors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_key(id_col: Column) -> Column:
    """Deterministic uniform-ish sort key in [0, 2^32): the first 8 hex
    digits of md5 of the id rendered as a string."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5-derived key
    falls below ``fraction`` of the key space. Same rows every run."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * (1 << 32))
    return df.filter(sample_key(F.col(id_col)) < F.lit(threshold))


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-domain Bernoulli sampling — the data-mixing
    primitive: each domain keeps its own fraction of rows (e.g. keep
    100% of a scarce high-quality source, 5% of a huge crawl), chosen
    by the same md5 key as :func:`hash_sample` so the mixture is
    reproducible across runs, cluster sizes, and engines.

    Domains absent from ``rates`` keep ``default_rate`` of their rows
    (0.0 = drop unlisted domains).

    Rates are *sampling fractions*; to hit target mixture *proportions*
    compute fractions from observed domain counts first (one cheap
    count-by-domain agg) — the operator stays a pure filter either way:
    no shuffle, pushed next to the scan, trivially parallel at 100 TB.
    The per-domain threshold is a when/otherwise chain (codegen), not a
    join — domain cardinality is assumed human-scale (sources, langs).
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for domain {d!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = None
    for d, r in sorted(rates.items()):
        t = F.lit(int(r * (1 << 32)))
        branch = F.when(F.col(domain_col) == d, t)
        threshold = branch if threshold is None else threshold.when(F.col(domain_col) == d, t)
    default_t = F.lit(int(default_rate * (1 << 32)))
    threshold = default_t if threshold is None else threshold.otherwise(default_t)
    return df.filter(sample_key(F.col(id_col)) < threshold)


def shuffle_key(id_col: Column, seed: int = 0) -> Column:
    """Deterministic per-epoch permutation key: md5 over ``seed:id``.
    Same seed → identical key (and therefore identical order) on every
    run, cluster size, and engine; a new seed is a new permutation."""
    salted = F.concat(F.lit(f"{seed}:"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")


def shard_of(key: Column, n_shards: int) -> Column:
    """Shard id for a :func:`shuffle_key` value: ``(key·n) >> 32`` —
    n_shards equal cuts of the 2^32 key space. Pure integer arithmetic
    (key < 2^32, so the product fits a bigint for any sane n_shards),
    monotone in the key, so reading shards 0..n−1 in order preserves
    the global key order. Crucially the shard is a function of the KEY
    ALONE — never of sampled range boundaries — so shard membership is
    reproducible across runs, cluster sizes, and engines (DuckDB
    replays it with the same expression)."""
    return F.shiftright(key * F.lit(n_shards), 32).cast("long")


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Epoch-reproducible global shuffle — the final data-ordering step
    before a training run: every row gets an md5(``seed:id``) key, an
    explicit ``shard`` column (``shard_of`` — fixed key-space cuts,
    monotone in the key), ``repartitionByRange`` on the key cuts
    ``n_shards`` balanced partitions, and a sort *within* each
    partition finishes the permutation. Reading shards in order replays
    one deterministic global permutation; bumping ``seed`` yields the
    next epoch's.

    Scale: ONE range-exchange shuffle (the range partitioner samples
    keys; no global single-task sort ever materializes), each task
    sorts only its own slice. Output keeps ``shuffle_key`` and
    ``shard`` columns so writers and auditors key on VALUES, not on
    partition indexes: range-partition boundaries come from reservoir
    sampling and may shift between runs, but the two columns never do
    — consumers that need reproducible membership (shard export,
    resumable epochs) group by ``shard``."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    keyed = df.withColumn("shuffle_key", shuffle_key(F.col(id_col), seed)).withColumn(
        "shard", shard_of(F.col("shuffle_key"), n_shards)
    )
    return keyed.repartitionByRange(n_shards, "shuffle_key").sortWithinPartitions(
        "shuffle_key", id_col
    )


def temperature_rates(
    counts: dict[str, int],
    temperature: float = 1.0,
    target_fraction: float = 1.0,
) -> dict[str, float]:
    """Per-domain sampling fractions that reshape observed domain counts
    toward a temperature-flattened mixture — the bridge from a domain
    census (``url.domain_mixture`` collected to its bounded dict) to
    :func:`mixture_sample`.

    Target mixture proportions p_d ∝ share_d^(1/T): T=1 preserves the
    natural mixture, T→∞ approaches uniform over domains, T<1 sharpens
    toward the head (the standard multilingual/multi-source rebalancing
    rule, e.g. mBERT/XLM-R exponent-smoothed sampling). The returned
    fraction for domain d is ``target_fraction · N · p_d / c_d``,
    capped at 1.0 (a domain too small to fill its target slot keeps
    everything — capping loses mass, so the realized total can fall
    below ``target_fraction·N`` when flattening demands more of a tail
    domain than exists; by design no domain is oversampled).

    Pure driver arithmetic over the bounded domain table (never the
    corpus); feed the result straight to :func:`mixture_sample`."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0, 1], got {target_fraction}")
    if not counts:
        return {}
    total = sum(counts.values())
    if total <= 0:
        return {d: 0.0 for d in counts}
    powered = {d: (c / total) ** (1.0 / temperature) for d, c in counts.items() if c > 0}
    z = sum(powered.values())
    rates = {}
    for d, c in counts.items():
        if c <= 0:
            rates[d] = 0.0
            continue
        p = powered[d] / z
        rates[d] = min(1.0, target_fraction * total * p / c)
    return rates


def weighted_bernoulli_sample(
    df: DataFrame,
    weight_col: str,
    base_rate: float,
    scale: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weight-proportional Bernoulli (Poisson) sample:
    row inclusion probability = min(1, base_rate · weight / scale).

    The data-mixing use case: thin a corpus while preserving its token
    mass — weight by length (or a quality score) so long/high-value
    documents survive proportionally more often, instead of uniform
    row sampling that under-represents them.

    Determinism across engines: the include test is
    ``md5_key(id) < weight · c`` with ``c = base_rate · 2^32 / scale``
    folded to one double literal at plan time — a single IEEE multiply
    and an integer-vs-double compare, so Spark and any SQL oracle agree
    bit-for-bit (no libm, no RNG). Rows with weight ≥ scale/base_rate
    are always kept (the key space caps at 2^32). Pure filter: no
    shuffle, pushed next to the scan, trivially parallel at 100 TB.
    """
    if base_rate < 0.0:
        raise ValueError(f"base_rate must be >= 0, got {base_rate}")
    if scale <= 0.0:
        raise ValueError(f"scale must be > 0, got {scale}")
    c = base_rate * float(1 << 32) / scale
    return df.filter(
        sample_key(F.col(id_col)) < F.col(weight_col).cast("double") * F.lit(c)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic quota sample: the ``k`` rows per stratum with the
    smallest md5-derived keys (ties broken by id). Every stratum keeps
    at most ``k`` rows regardless of its size — the standard data-mixing
    primitive (e.g. equal-per-language corpora)."""
    w = Window.partitionBy(*strata_cols).orderBy(
        sample_key(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int,
    order_by: Sequence[Column],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keep the top-``k`` rows per group under ``order_by`` (e.g. cap
    documents per source domain, keeping the highest-quality ones) —
    the corpus-balancing primitive next to :func:`stratified_sample`'s
    random quota.

    Exact two-phase evaluation: a single window over a hot group is the
    one partition AQE cannot split, so phase 1 takes top-k within
    (group, salt) — every task bounded at group_size/n_salts — and
    phase 2 ranks the ≤ k·n_salts survivors per group exactly. Each
    salt's local top-k is a superset of its contribution to the global
    top-k, so the result is identical to the naive single window for
    any total order (pass a tiebreak column to make it total).

    The salt is derived from row CONTENT (xxhash64 of ``salt_cols``,
    default: every input column), never from a nondeterministic
    expression: a monotonically_increasing_id salt would be recomputed
    differently on stage retry after a shuffle-fetch failure, letting
    rows move between salt partitions mid-query (duplicated or lost
    rows) — precisely in the large-cluster regime the salting targets.
    Rows identical in ``salt_cols`` share a salt; pass a high-entropy
    id column there if the corpus carries massive exact duplicates.
    """
    groups = [F.col(c) for c in group_cols]
    order = list(order_by)
    salt_src = [F.col(c) for c in (salt_cols if salt_cols is not None else df.columns)]
    salt = F.pmod(F.xxhash64(*salt_src), F.lit(n_salts))
    w1 = Window.partitionBy(*groups, F.col("_cap_salt")).orderBy(*order)
    w2 = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn("_cap_salt", salt)
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .withColumn("_rn2", F.row_number().over(w2))
        .filter(F.col("_rn2") <= k)
        .drop("_cap_salt", "_rn1", "_rn2")
    )


def split_corpus(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint corpus splits (train/val/test): label
    each row by which cumulative md5-key band its id falls in —
    ``fractions`` like {"train": .98, "val": .01, "test": .01} (must
    sum to 1 within float tolerance; band edges round to integer key
    space, the last band absorbs the remainder). The same id lands in
    the same split on every run, machine, and engine (the
    conv/substring/md5 identity), membership never depends on
    partitioning or row order, and — unlike randomSplit — adding or
    removing OTHER rows never moves an id between splits. One codegen
    CASE over the key, no shuffle; fully SQL-replayable (an r8 oracle
    candidate)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    key = sample_key(F.col(id_col))
    names = list(fractions)
    edges: list[int] = []
    acc = 0.0
    for name in names[:-1]:
        acc += fractions[name]
        edges.append(int(acc * (1 << 32)))
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(key < F.lit(edge), F.lit(name)).otherwise(expr)
    # nested whens evaluate smallest edge first after the reversal
    return df.withColumn(out_col, expr)


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_stages: int = 3,
    n_shards: int = 32,
    seed: int = 0,
    id_col: str = "doc_id",
    ascending: bool = True,
) -> DataFrame:
    """Curriculum data ordering (Bengio et al. 2009): partition the
    corpus into ``n_stages`` difficulty stages by quantiles of
    ``score_col`` (ascending = easy-first when higher score means
    harder), then lay rows out in (stage, md5-shuffle-key) order —
    stages arrive in curriculum order while each stage is internally
    a reproducible :func:`deterministic_shuffle` permutation.

    Adds ``stage`` (0-based) and ``shuffle_key``; downstream writers
    consume the order exactly like deterministic_shuffle's (and
    ``write_training_shards`` keys on values, so membership is
    reproducible). Stage thresholds come from ``approxQuantile``
    (driver gets n_stages−1 floats — bounded); the stage label is one
    codegen CASE. NULL scores raise (a curriculum over unscored rows
    is an upstream bug, not a policy).

    Scale: one pass for the quantile summaries (distributive merge, no
    sort), one range-exchange on (stage, key) — no global single-task
    sort; each task sorts its own slice. Bumping ``seed`` reshuffles
    within stages without touching stage membership."""
    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2, got {n_stages}")
    if df.filter(F.col(score_col).isNull()).limit(1).count() > 0:
        raise ValueError(f"curriculum_order: NULL values in {score_col}")
    probs = [i / n_stages for i in range(1, n_stages)]
    cuts = df.approxQuantile(score_col, probs, 0.0)
    sc = F.col(score_col) if ascending else -F.col(score_col)
    bounds = cuts if ascending else [-c for c in reversed(cuts)]
    stage = F.lit(0)
    for i, c in enumerate(bounds):
        stage = F.when(sc > F.lit(float(c)), F.lit(i + 1)).otherwise(stage)
    keyed = df.withColumn("stage", stage.cast("int")).withColumn(
        "shuffle_key", shuffle_key(F.col(id_col), seed)
    )
    return keyed.repartitionByRange(
        n_shards, "stage", "shuffle_key"
    ).sortWithinPartitions("stage", "shuffle_key", id_col)
