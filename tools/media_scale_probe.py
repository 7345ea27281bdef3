"""Scaling measurement for the round-3 operators: media decode
(PNG / WAV / MP4) and the skew-aware salted join, at growing sizes.

    python tools/media_scale_probe.py [--sizes 5000 20000 80000]

Media stages build + decode real payloads per row inside Arrow
``mapInPandas`` (the decode cost is per-row Python/numpy — the probe
verifies the per-partition parallelism keeps the scale-up linear).
The salted-join probe plants a celebrity key owning ~30% of a fact
table and compares the skew-routed join (hot keys salted over 8
buckets, cold tail plain) against the input growth.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_ids(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n).select(F.col("id").alias("doc_id")).repartition(32)


def synth_skewed_fact(spark, n: int):
    """~30% of rows on key 0, the rest uniform over 1..999."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.when(F.pmod(F.col("id"), 10) < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), 999) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    ).repartition(32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int, default=[5000, 20000, 80000])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_cdc_elasticsearch_pipeline_spark.extensions import audio, multimodal, video
    from kafka_cdc_elasticsearch_pipeline_spark.operators.skew import (
        hot_keys,
        skew_aware_join,
    )
    from kafka_cdc_elasticsearch_pipeline_spark.session import get_spark

    spark = get_spark("media-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # (payload builder, decode stage) per op: the payload is built and
    # PERSISTED before timing, so the measured wall is the decode fleet
    # cost (what 100 TB sizing needs), not the synthetic encoder.
    decode_ops = {
        "png_decode": (
            multimodal.attach_png_payload,
            lambda p: multimodal.decode_png_stats(p).agg(F.sum("pixel_sum")).collect(),
        ),
        "gif_decode": (
            multimodal.attach_gif_payload,
            lambda p: multimodal.decode_gif_stats(p).agg(F.sum("index_sum")).collect(),
        ),
        "jpeg_decode": (
            multimodal.attach_jpeg_payload,
            lambda p: multimodal.decode_jpeg_stats(p).agg(F.sum("pixel_sum")).collect(),
        ),
        # Realistic-size row: 96-128 px gradient images (every block
        # has AC energy) — the tiny-fixture rows measure per-row
        # overhead; this one measures the codec.
        "jpeg_decode_96px": (
            lambda df: multimodal.attach_jpeg_payload(
                df, px_base=96, px_range=32, gradient=True
            ),
            lambda p: multimodal.decode_jpeg_stats(p).agg(F.sum("pixel_sum")).collect(),
        ),
        "wav_decode": (
            audio.attach_wav_payload,
            lambda p: audio.decode_wav_stats(p).agg(F.sum("amp_sum")).collect(),
        ),
        # full near-dup chains (decode + fingerprint + banded pairing):
        # pair volume must follow planted density, wall must follow rows
        "image_neardup": (
            multimodal.attach_texture_png_payload,
            lambda p: multimodal.image_neardup_pairs(p).count(),
        ),
        "audio_neardup": (
            audio.attach_texture_wav_payload,
            lambda p: audio.audio_neardup_pairs(p).count(),
        ),
        "mp4_metadata": (
            video.attach_mp4_payload,
            lambda p: video.parse_mp4_stats(p).agg(F.sum("duration_ms")).collect(),
        ),
        # r07: full video chain — container walk + ~5 sampled frame
        # PNG decodes per doc + majority hash + banded pairing
        "video_neardup": (
            video.attach_texture_mp4_payload,
            lambda p: video.video_neardup_pairs(p).count(),
        ),
    }

    def salted(df):
        dim = spark.range(1000).select(
            F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
        )
        hot = hot_keys(df, "k", top_n=5, min_share=0.05)
        return skew_aware_join(df, dim, "k", "dk", hot, salt_buckets=8).count()

    ops = [*decode_ops, "salted_skew_join"]
    cores = spark.sparkContext.defaultParallelism

    results: dict[str, dict[int, float]] = {o: {} for o in ops}
    mbytes: dict[str, dict[int, float]] = {o: {} for o in ops}
    for n in args.sizes:
        docs = synth_ids(spark, n)
        fact = synth_skewed_fact(spark, n)

        def timed(fn, src, op):
            fn(src)  # warm
            # best-of-2: single-shot wall times at these sizes carry
            # ±1s scheduler/GC noise that swamps the ratio signal
            best = None
            for _ in range(2):
                t0 = time.time()
                fn(src)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            results[op][n] = round(best, 2)

        for op, (attach, decode) in decode_ops.items():
            payload = attach(docs).persist()
            mbytes[op][n] = payload.agg(
                F.sum(F.length("payload"))
            ).collect()[0][0] / 1e6
            timed(decode, payload, op)
            payload.unpersist()
            spark.catalog.clearCache()
        timed(salted, fact, "salted_skew_join")
        spark.catalog.clearCache()
        print(f"n={n}: " + ", ".join(f"{o}={results[o][n]}s" for o in ops))

    lo, hi = args.sizes[0], args.sizes[-1]
    note = (
        f"cores={cores}; decode timings run over a PERSISTED payload"
        " column (fixture construction excluded — the measured wall is"
        " the decode fleet cost, which is what 100 TB sizing needs);"
        " throughput = payload bytes / wall / cores at the largest"
        " size. Most probe fixtures are TINY images (8-24 px), so"
        " per-image + per-row overhead dominates and those MB/s/core"
        " figures are a floor — `jpeg_decode_96px` (96-128 px gradient"
        " images, every block carrying AC coefficients) isolates the"
        " codec itself. Single-core codec ceilings on realistic"
        " payloads: PNG ~8 MB/s for a mixed-filter 256x256 RGB (117"
        " with the vectorizable Up filter, 3.6 for all-Paeth — the"
        " sequential-by-spec worst case); JPEG ~1.9 MB/s even on"
        " 256x256 NOISE (worst case: every AC nonzero) after the"
        " round-5 rewrite (batched einsum IDCT, 16-bit packed-LUT"
        " lookahead Huffman, bulk coefficient scatter — the r04"
        " per-bit loops measured ~0.3). Fleet sizing at 100 TB:"
        " corpus_bytes / (MB/s/core x cores), e.g. 100 TB of PNG at"
        " 8 MB/s/core on 1000 x 16 cores ~= 13 min of decode."
    )
    lines = [
        "| operator | " + " | ".join(f"{n:,} rows" for n in args.sizes)
        + f" | time ×@{hi // lo}× data | MB/s/core @{hi:,} |",
        "|---|" + "---|" * (len(args.sizes) + 2),
    ]
    for op in ops:
        ratio = results[op][hi] / max(results[op][lo], 0.01)
        if op in decode_ops:
            thr = mbytes[op][hi] / max(results[op][hi], 1e-9) / cores
            thr_s = f"{thr:.2f}"
        else:
            thr_s = "—"
        lines.append(
            f"| {op} | " + " | ".join(f"{results[op][n]}s" for n in args.sizes)
            + f" | {ratio:.1f}× | {thr_s} |"
        )
    print("\n" + note + "\n")
    print("\n".join(lines))
    section = (
        "\n## Media decode + skew join scaling (tools/media_scale_probe.py)\n\n"
        + note + "\n\n" + "\n".join(lines) + "\n"
    )
    scaling_md = os.path.join(REPO, "SCALING.md")
    if os.path.exists(scaling_md):
        from tools._md_sections import replace_section

        # Replace ONLY this probe's section IN PLACE so section order
        # is stable across runs (the fact-table probe lives after it).
        replace_section(
            scaling_md, "\n## Media decode + skew join scaling", section
        )
        print(f"updated media section in {scaling_md}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
