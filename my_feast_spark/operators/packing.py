"""Best-fit-decreasing sequence packing — padding-efficiency for
variable-length training sequences.

The workload's fixed-chunk packer (``functions.text.chunk_array`` +
running offsets) never pads because every chunk is the same size; real
pipelines also pack WHOLE variable-length sequences (documents,
conversation turns) into fixed-capacity packs, where the packing
algorithm decides how many pad tokens the hardware burns. First-fit /
best-fit decreasing is the standard answer (guaranteed within 11/9 of
optimal bin count; Johnson 1973) and is what sequence-packing papers
(e.g. Krell et al. 2021, "Efficient Sequence Packing") build on.

Packing is an inherently SEQUENTIAL fold over the sorted sequence list
— not expressible as joins/windows — so the operator shards the corpus
and runs the fold per shard with ``applyInPandas``: the sequential
state is bounded by the shard, shards run in parallel, and the result
is reproducible because the fold order (length desc, id asc) and the
tie rule (lowest pack id among equal best fits) are total orders. This
is the legitimate use of the Python escape hatch: the decision loop is
tiny integer state, the data never leaves the JVM except (id, len)
pairs.
"""

from __future__ import annotations

from bisect import bisect_left, insort

from pyspark.sql import DataFrame, functions as F


def pack_bfd(
    df: DataFrame,
    id_col: str,
    len_col: str,
    capacity: int,
    *,
    shard_col: str | None = None,
    num_shards: int = 32,
) -> DataFrame:
    """Assign each sequence to a pack of at most ``capacity`` total
    length via best-fit decreasing, per shard.

    Returns (shard, pack_id, id, len): one row per input sequence.
    ``shard_col`` names an existing shard key; otherwise sequences are
    sharded deterministically by ``pmod(xxhash64(id), num_shards)``
    (the shard only bounds the sequential fold — any deterministic
    assignment works, and packing quality degrades only via per-shard
    tail fragmentation, one partially-filled pack per shard).

    Rows with ``len > capacity`` raise at execution time: silently
    dropping or truncating a too-long sequence is a pipeline bug the
    caller must resolve (chunk first — ``functions.text.chunk_array``).
    NULL / non-positive lengths raise for the same reason.
    """
    if capacity < 1:
        raise ValueError("capacity must be positive")
    if shard_col is None:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    else:
        shard = F.col(shard_col)
    slim = df.select(
        shard.cast("long").alias("shard"),
        F.col(id_col).cast("long").alias("id"),
        F.col(len_col).cast("long").alias("len"),
    )
    cap = int(capacity)

    def _pack(pdf):
        import pandas as pd

        bad = pdf[(pdf["len"].isna()) | (pdf["len"] <= 0) | (pdf["len"] > cap)]
        if len(bad):
            raise ValueError(
                f"pack_bfd: {len(bad)} sequence(s) with NULL/non-positive "
                f"length or length > capacity={cap} "
                f"(first id={bad['id'].iloc[0]})"
            )
        pdf = pdf.sort_values(["len", "id"], ascending=[False, True])
        # sorted list of (remaining, pack_id): bisect for the smallest
        # remaining >= len — best fit, lowest pack id among ties
        rems: list[tuple[int, int]] = []
        assign = []
        next_pack = 0
        for length in pdf["len"].to_numpy():
            length = int(length)
            i = bisect_left(rems, (length, -1))
            if i < len(rems):
                rem, pid = rems.pop(i)
                insort(rems, (rem - length, pid))
            else:
                pid = next_pack
                next_pack += 1
                insort(rems, (cap - length, pid))
            assign.append(pid)
        out = pd.DataFrame({
            "shard": pdf["shard"].to_numpy(),
            "pack_id": assign,
            "id": pdf["id"].to_numpy(),
            "len": pdf["len"].to_numpy(),
        })
        return out

    return slim.groupBy("shard").applyInPandas(
        _pack, "shard long, pack_id long, id long, len long"
    )


def packing_stats(assigned: DataFrame, capacity: int) -> DataFrame:
    """One-row padding accounting for a :func:`pack_bfd` result:
    (n_packs, n_seqs, total_len, pad_tokens, fill_frac) — the number a
    training job actually cares about (pad_tokens is burned hardware).
    """
    per_pack = assigned.groupBy("shard", "pack_id").agg(
        F.sum("len").alias("used"), F.count(F.lit(1)).alias("n")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n").alias("n_seqs"),
        F.sum("used").alias("total_len"),
        (F.count(F.lit(1)) * F.lit(capacity) - F.sum("used")).alias(
            "pad_tokens"
        ),
        (
            F.sum("used")
            / (F.count(F.lit(1)) * F.lit(capacity)).cast("double")
        ).alias("fill_frac"),
    )
