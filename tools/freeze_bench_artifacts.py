"""Regenerate the committed frozen bench artifacts (r12 verdict item 4).

Trains with the EXACT parameters of the live correctness rows:
- langid_sf0.01.json / langid_sf0.1.json: q_x9's NB langid model
  (train split doc_id % 5 != 0, n=2, alpha=0.5, max_grams=300) per SF
  (the model is corpus-trained, so the artifact is per-SF);
- unigram_q_ug1.json: q_ug1's quantized unigram model (the literal
  _WP_MINI_CORPUS, vocab 60, max_piece_len 6, em_iters 2, 20-bit
  dyadic quantization) — SF-independent.

Re-run whenever the training code or parameters change;
tests/test_benchvariants.py pins artifact == live-trained at sf0.01
so drift turns the suite red instead of silently staleing the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from electrician_spark.benchvariants import ARTIFACT_DIR  # noqa: E402
from electrician_spark.session import cpu_budget, get_session  # noqa: E402


def main() -> None:
    from electrician_spark.functions import tokenizer as tk
    from electrician_spark.io import read_table
    from electrician_spark.operators import langid
    from electrician_spark.queries import _WP_MINI_CORPUS

    spark = get_session("freeze-bench-artifacts", cpus=cpu_budget())
    os.makedirs(ARTIFACT_DIR, exist_ok=True)

    for sf in ("sf0.01", "sf0.1"):
        docs = read_table(spark, f"/root/testdata/{sf}", "documents").select(
            "doc_id", "lang", "text"
        )
        model = langid.train_langid(
            docs.filter(F.col("doc_id") % 5 != 0), n=2, alpha=0.5, max_grams=300
        )
        out = os.path.join(ARTIFACT_DIR, f"langid_{sf}.json")
        langid.save_langid(model, out)
        print(f"wrote {out} ({os.path.getsize(out)} bytes)")

    mini = spark.createDataFrame([(t,) for t in _WP_MINI_CORPUS], "text string")
    model = tk.train_unigram_tokenizer(mini, vocab_size=60, max_piece_len=6, em_iters=2)
    qm = tk.quantize_logprobs(model, bits=20)
    out = os.path.join(ARTIFACT_DIR, "unigram_q_ug1.json")
    tk.save_tokenizer(out, "unigram", qm)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")

    # r16: wordpiece/BPE artifacts with q_wp1's / q_bp1's exact live
    # training parameters (both SF-independent — literal mini-corpus)
    vocab = tk.train_wordpiece_vocab(mini, vocab_size=70, min_count=1)
    out = os.path.join(ARTIFACT_DIR, "wordpiece_q_wp1.json")
    tk.save_tokenizer(out, "wordpiece", vocab)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")

    merges = tk.train_bpe_merges(mini, num_merges=40, min_count=1)
    out = os.path.join(ARTIFACT_DIR, "bpe_q_bp1.json")
    tk.save_tokenizer(out, "bpe", merges)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
