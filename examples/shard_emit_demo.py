"""Training-shard emit walkthrough — the LAST mile of the corpus
pipeline: turn curated documents into the token-id shard files a
training loader actually streams.

  1. vocabulary   — corpus top-k tokens (TakeOrdered, never a global
                    sort), built once
  2. encode       — broadcast-join encode (the large-vocabulary path:
                    the vocab ships once per executor, never enters the
                    expression tree)
  3. sequence cut — each doc's id array sliced into fixed-size training
                    sequences (map-only)
  4. shuffle      — deterministic (shard_id, shard_pos) layout from the
                    portable hash of the sequence key: re-runs and
                    engines agree on the exact order, and a new salt is
                    a new epoch permutation without rewriting anything
  5. emit         — ONE partitioned write, one directory per shard; a
                    loader streams shards sequentially and gets the
                    shuffled order for free

Run:  python examples/shard_emit_demo.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from my_feast_spark import get_session
from my_feast_spark.functions.text import chunk_array, tokens
from my_feast_spark.operators.sampling import shuffle_layout
from my_feast_spark.operators.vocab import (
    encode_ids_broadcast_join,
    token_vocabulary,
)
from my_feast_spark.sources.readers import load_table
from my_feast_spark.sources.writers import write_partitioned

SEQ_LEN = 32
VOCAB_SIZE = 256
N_SHARDS = 4


def main(sf_dir: str = "/root/testdata/sf0.01", out_dir: str | None = None) -> dict:
    spark = get_session(app_name="shard-emit-demo")
    out_dir = out_dir or os.path.join(tempfile.mkdtemp(), "shards")

    # tokenize ONCE; both the vocabulary build and the encode read the
    # projected array
    toked = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("__ltoks")
    )

    # 1-2: vocabulary + broadcast-join encode (OOV -> -1)
    vocab_df = token_vocabulary(toked, "__ltoks", VOCAB_SIZE)
    encoded = encode_ids_broadcast_join(toked, "doc_id", "__ltoks", vocab_df)

    # 3: fixed-size, non-overlapping training sequences per doc
    # (stride == size -> concat-and-cut within the doc); the sequence
    # key (doc_id, seq_idx) is the shuffle unit
    seqs = encoded.select(
        "doc_id",
        F.posexplode_outer(
            chunk_array(F.col("ids"), size=SEQ_LEN, stride=SEQ_LEN)
        ).alias("seq_idx", "seq"),
    ).filter(F.col("seq").isNotNull()).select(
        F.concat_ws("#", F.col("doc_id"), F.col("seq_idx")).alias("seq_key"),
        F.col("seq.chunk").alias("token_ids"),
        F.size(F.col("seq.chunk")).alias("n_tokens"),
    )

    # 4-5: deterministic shard layout + one partitioned write
    laid = shuffle_layout(seqs, "seq_key", n_shards=N_SHARDS, salt="epoch0")
    write_partitioned(
        laid, out_dir, ["shard_id"], sort_within=["shard_pos"]
    )

    back = spark.read.parquet(out_dir)
    per_shard = {
        r.shard_id: r.n
        for r in back.groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return {
        "out_dir": out_dir,
        "n_sequences": back.count(),
        "n_shards": len(per_shard),
        "per_shard": per_shard,
        "total_tokens": back.agg(F.sum("n_tokens")).collect()[0][0],
    }


if __name__ == "__main__":
    print(main(*sys.argv[1:]))
