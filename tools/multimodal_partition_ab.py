"""r16 A/B: size the CPU-bound codec Arrow stage to cores (the jpeg
n_partitions precedent) for the remaining payload-synth queries.

The sf parquet tables are single row-group files, so the whole
synth->decode Python chain otherwise runs as ONE task; the candidate
change repartitions the 2-column (id, text) projection to
defaultParallelism before the first mapInPandas. Interleaved legs
(narrow, same process, min basis) per query: old = n_partitions=None,
new = n_partitions="auto" (size-derived width). jpeg's old leg is
n_partitions=cores, its r12 wiring.

Usage: PYTHONPATH=/root/repo python tools/multimodal_partition_ab.py
Writes /tmp/multimodal_partition_ab.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
    extract_audio_features,
    extract_features,
    frame_features,
    sample_frames,
    text_to_bmp_payload,
    text_to_gif_animation_payload,
    text_to_gif_payload,
    text_to_png_payload,
    text_to_tiff_payload,
    text_to_wav_payload,
)
from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.session import get_spark

N_ROUNDS = int(os.environ.get("N_ROUNDS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("caf-mm-ab-r16")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    d = entrymod.T(spark, sf_dir, "documents")

    def img(synth, np_):
        feats = extract_features(synth(d, "text", n_partitions=np_))
        return feats.select("doc_id", "width", "height", "channels", "pixel_sum")

    def wav(np_):
        feats = extract_audio_features(
            text_to_wav_payload(
                d, "text", float_every=4, g711=True, aiff=True, n_partitions=np_
            )
        )
        return feats.select(
            "doc_id", "sample_rate", "channels", "bits", "n_frames",
            "duration_ms", "sample_sum", "sample_sumsq",
        )

    def gif_frames(np_):
        frames = sample_frames(
            text_to_gif_animation_payload(d, "text", n_partitions=np_),
            every_n=1,
        )
        return frame_features(frames)

    def jpeg(np_):
        from cafmeteorologyectower_azuredatalakeprocessingscripts_spark.llm.multimodal import (
            text_to_jpeg_payload,
        )

        feats = extract_features(
            text_to_jpeg_payload(
                d, "text", progressive_every=5, cmyk_every=7, n_partitions=np_
            )
        )
        return feats.select("doc_id", "width", "height", "channels", "pixel_sum")

    variants = {
        "gif_pixels": lambda np_: img(text_to_gif_payload, np_),
        "gif_frames": gif_frames,
        "png_pixels": lambda np_: img(text_to_png_payload, np_),
        "bmp_pixels": lambda np_: img(text_to_bmp_payload, np_),
        "tiff_pixels": lambda np_: img(text_to_tiff_payload, np_),
        "wav_features": wav,
        "jpeg_pixels": jpeg,
    }
    # jpeg's OLD form was n_partitions=cores (the r12 wiring), not None
    old_arg = {"jpeg_pixels": cores}

    # warm the worker pool once
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    def t(df) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    res: dict[str, dict] = {n: {"old": [], "new": []} for n in variants}
    for r in range(N_ROUNDS):
        for name, build in variants.items():
            res[name]["old"].append(round(t(build(old_arg.get(name))), 3))
            res[name]["new"].append(round(t(build("auto")), 3))
    out = {}
    for name, d2 in res.items():
        o, n = min(d2["old"]), min(d2["new"])
        out[name] = {
            "old_min": o, "new_min": n,
            "speedup": round(o / n, 2) if n else None,
            "old": d2["old"], "new": d2["new"],
        }
    out["_cores"] = cores
    out["_n_rounds"] = N_ROUNDS
    with open("/tmp/multimodal_partition_ab.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
