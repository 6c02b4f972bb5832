"""Round-10 regression tests: the VERDICT r9 #5 eager-count guard in
``embed_neardup_pairs``, and the ADVICE r9 score='arrow'/block=False
validation."""

import warnings

import pytest
from pyspark.sql import functions as F


def _synth_emb(spark, n, dim=8):
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.conv(
                F.substring(F.md5(F.concat(F.col("id"), F.lit(":"), i)), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(2**31)
            - F.lit(1.0)
        ).cast("float"),
    )
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def test_embed_neardup_eager_count_warns_on_large_frame(spark):
    """planes=None + approx_count=None on a corpus-sized input must warn
    that plan construction runs an eager df.count() (VERDICT r9 #5).
    The estimate is plan-side; the range source is wide enough that
    Catalyst's sizeInBytes clears the 64 MB floor."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        embed_neardup_pairs,
    )

    big = _synth_emb(spark, 100_000_000)
    with pytest.warns(RuntimeWarning, match="EAGER"):
        # construction alone triggers the auto-size; don't execute the
        # 100M-row count — the warning fires before it
        try:
            embed_neardup_pairs(
                big, threshold=0.9, dim=8, approx_count=None, planes=None
            )
        except Exception:
            # the count job itself may be interrupted/slow-path; the
            # guard under test fired before it
            raise


def test_embed_neardup_eager_count_silent_with_escape_hatches(spark):
    """planes= or approx_count= skips the eager count — and must also
    skip the warning; a small (oracle-scale) frame stays silent too."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        embed_neardup_pairs,
    )

    big = _synth_emb(spark, 100_000_000)
    small = _synth_emb(spark, 200)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        embed_neardup_pairs(big, threshold=0.9, dim=8, planes=6)
        embed_neardup_pairs(big, threshold=0.9, dim=8, approx_count=100_000_000)
        embed_neardup_pairs(small, threshold=0.9, dim=8)  # under the floor


def test_embed_neardup_arrow_requires_block(spark):
    """score='arrow' is bucket-local BLAS; with block=False there are no
    buckets and the old code silently fell through to the expression
    scorer (ADVICE r9). It must raise instead."""
    from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.similarity import (
        embed_neardup_pairs,
    )

    emb = _synth_emb(spark, 50)
    with pytest.raises(ValueError, match="block=True"):
        embed_neardup_pairs(emb, threshold=0.9, block=False, score="arrow")
