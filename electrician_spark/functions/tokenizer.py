"""BPE tokenizer training and encoding over a Spark corpus.

Scale design (the one production tokenizer trainers use — HF
``tokenizers``, SentencePiece): the corpus-scale work is a single
distributed pass that reduces the token stream to a *word-frequency
table* (one explode → one map-side-combinable groupBy, shuffle carries
distinct words only), and the merge loop itself runs driver-local over
that bounded table (``top_n_words`` rows — a few hundred thousand at
most, regardless of corpus size). At 100 TB the corpus pass is the only
part that touches the data; the merge loop's cost depends on vocabulary
shape, not corpus size. This is a *documented bounded-driver-work*
operator, same contract as k-means' k-centroid collects
(similarity.py) — the collect is O(top_n_words), never O(corpus).

Encoding applies the learned merge ranks per pre-token inside an
Arrow-batched pandas UDF (the merge table broadcasts with the closure;
per-piece merging is data-dependent looping that Column expressions
cannot express). A word-level LRU cache inside the batch exploits the
Zipfian repeat rate — most pieces in a batch are cache hits.

Algorithm: Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units" (the classic BPE trainer): repeat
``num_merges`` times {count adjacent symbol pairs weighted by word
frequency; merge the most frequent pair everywhere}. Ties break
lexicographically so training is deterministic.

Reference parity: the reference engine has no tokenizer (its text ops
are keyword containment / tagging — see functions/text.py docstring);
this module is part of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from electrician_spark.functions.text import token_frequency_table

# End-of-word sentinel appended to every word's symbol sequence so
# merges distinguish word-final from word-internal contexts ("est</w>"
# vs "est" in "estimate"), per the original paper.
END_OF_WORD = "</w>"


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] += freq
    return counts


def _train_bpe_merges_reference(
    vocab: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    """Textbook Sennrich loop — recounts every pair per merge. Kept as
    the O(num_merges · Σ|word|) equality reference the incremental
    trainer is pinned against in tests; never called on the hot path."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        pair, freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        merges.append(pair)
        vocab = {_merge_pair(s, pair): f for s, f in vocab.items()}
    return merges


def _merge_pair(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    merged: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            merged.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            merged.append(symbols[i])
            i += 1
    return tuple(merged)


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    top_n_words: int = 200_000,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a corpus.

    Distributed: one corpus scan builds the (word, count) table via
    :func:`text.token_frequency_table` (BPE pre-tokenization, so words
    arrive with their leading-space convention intact); the top
    ``top_n_words`` by count are collected — bounded driver work.
    Local: the Sennrich merge loop over that table. Words below
    ``min_count`` are pruned before collection (they cannot influence
    early merges and dominate table size on web text).

    Returns the merge list in application order. Deterministic: ties on
    pair frequency break on the pair itself.

    The merge loop is the *incremental* Sennrich trainer: pair counts
    and a pair→words inverted index are maintained across merges, so
    each merge touches only the words that actually contain the merged
    pair (Zipf: a vanishing fraction past the first few hundred merges)
    instead of recounting every pair in every word. Same output as the
    textbook recount loop (:func:`_train_bpe_merges_reference`, pinned
    by test at ≥2k merges) — at a production 32k merges the recount
    form is hours of driver time, this is seconds.
    """
    freq_rows = token_frequency_table(
        df, text_col=text_col, tokenizer="bpe", min_count=min_count, top_n=top_n_words
    ).collect()
    agg: dict[tuple[str, ...], int] = {}
    for row in freq_rows:
        symbols = tuple(row["token"]) + (END_OF_WORD,)
        agg[symbols] = agg.get(symbols, 0) + int(row["count"])
    return _merge_loop(agg, num_merges)


def _merge_loop(
    agg: dict[tuple[str, ...], int], num_merges: int
) -> list[tuple[str, str]]:
    """Driver-local incremental merge loop over a (symbols → freq)
    vocabulary table (see :func:`train_bpe_merges` for the contract)."""
    words: list[tuple[str, ...]] = list(agg)
    freqs: list[int] = [agg[w] for w in words]

    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, symbols in enumerate(words):
        f = freqs[wi]
        for p in zip(symbols, symbols[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(wi)

    # Lazy-deletion max-heap over (-count, pair): selection is O(log H)
    # amortized instead of a full O(|pairs|) scan per merge. Every count
    # change pushes a fresh entry; a popped entry is authoritative only
    # if its count still matches pair_counts (stale ones are discarded).
    # Tuple order (-count, pair) reproduces the reference tie-break
    # exactly: highest count, then lexicographically smallest pair.
    import heapq

    heap: list[tuple[int, tuple[str, str]]] = [
        (-c, p) for p, c in pair_counts.items()
    ]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair = None
        while heap:
            negc, cand = heapq.heappop(heap)
            if pair_counts.get(cand) == -negc:
                pair, freq = cand, -negc
                break
        if pair is None:
            break
        if freq < 2:
            break  # every remaining pair is unique — no information left
        merges.append(pair)
        # Update ONLY the words containing the merged pair. The index
        # holds stale members (words that lost the pair in an earlier
        # merge keep their entry until visited) — harmless: staleness
        # costs one skipped iteration, while pair_counts, which drives
        # selection, is kept exact below.
        for wi in pair_words.pop(pair, ()):  # noqa: B909 — pop before iterate
            old = words[wi]
            new = _merge_pair(old, pair)
            if new == old:
                continue  # stale index entry
            f = freqs[wi]
            for p in zip(old, old[1:]):
                c = pair_counts[p] - f
                if c > 0:
                    pair_counts[p] = c
                    heapq.heappush(heap, (-c, p))
                else:
                    del pair_counts[p]
            for p in zip(new, new[1:]):
                c = pair_counts[p] + f
                pair_counts[p] = c
                heapq.heappush(heap, (-c, p))
                pair_words.setdefault(p, set()).add(wi)
            words[wi] = new
    return merges


def bpe_vocab(merges: list[tuple[str, str]], base_alphabet: str | None = None) -> list[str]:
    """Vocabulary implied by a merge list: the merged symbols in merge
    order (optionally prefixed by an explicit base alphabet). The id of
    a symbol is its index — the standard BPE vocab file layout."""
    vocab = list(base_alphabet) if base_alphabet else []
    seen = set(vocab)
    for a, b in merges:
        sym = a + b
        if sym not in seen:
            seen.add(sym)
            vocab.append(sym)
    return vocab


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one pre-token using learned merge ranks (lowest rank
    merges first — exactly the trainer's application order)."""
    symbols = list(word) + [END_OF_WORD]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Add ``out_col``: the BPE segmentation of ``text_col`` as an
    array of subword strings.

    The merge-rank table ships to executors in the UDF closure
    (broadcast-equivalent; a learned table is small — ``num_merges``
    entries). Pre-tokenization runs JVM-side first
    (:data:`text.BPE_PRETOKEN_PATTERN` via ``bpe_pretokens``), so the
    pandas UDF only sees the piece arrays; inside each Arrow batch a
    word→segmentation cache collapses the Zipfian head, so per-batch
    work is proportional to *distinct* pieces, not total pieces."""
    from electrician_spark.functions.text import bpe_pretokens

    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(pieces_series):
        cache: dict[str, list[str]] = {}

        def enc(pieces):
            if pieces is None:
                # NULL text → NULL tokens (match normalize_text's NULL
                # propagation; one bad row must not abort the job).
                return None
            out: list[str] = []
            for p in pieces:
                seg = cache.get(p)
                if seg is None:
                    seg = encode_word(p, ranks)
                    cache[p] = seg
                out.extend(seg)
            return out

        return pieces_series.map(enc)

    return df.withColumn(out_col, _encode(bpe_pretokens(F.col(text_col))))


def bpe_encoded_length(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_len",
) -> DataFrame:
    """Add ``out_col``: the exact learned-vocab token count (the length
    budget a packing/filter stage actually needs — cheaper than
    materializing the token arrays when only the count is consumed)."""
    tmp = "__bpe_tokens_tmp"
    out = bpe_encode(df, merges, text_col=text_col, out_col=tmp)
    return out.withColumn(out_col, F.size(F.col(tmp))).drop(tmp)
