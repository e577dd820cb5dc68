"""Multimodal-stage throughput: rows/sec and MB/sec through the
Arrow-batched mapInPandas stages (decode image/audio, 1→N frame/window
fan-out) over the documents table's bytes as payloads.

The r4 verdict asked for the stub path itself to be benchable after the
iterrows→numpy vectorization (functions/multimodal.py); this publishes
the number. Writes BENCH_mm.json.

Usage: python tools/bench_mm.py [sf_dir]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from datafusion_ducklake_spark.functions import multimodal
from datafusion_ducklake_spark.sparkutil import build_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_spark("ducklake-bench-mm")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    total_bytes = docs.select(
        F.sum(F.length(F.encode("text", "utf-8")))).collect()[0][0]

    def media(kind, dur_factor):
        return docs.select(
            F.col("doc_id").alias("media_id"), F.lit(kind).alias("kind"),
            F.encode("text", "utf-8").alias("payload"),
            F.lit(f"{kind}/fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length("text") * dur_factor).cast("long").alias("duration_ms"))

    stages = {
        "decode_image_features": lambda: multimodal.decode_image_features(
            media("image", 0)),
        "decode_audio_features": lambda: multimodal.decode_audio_features(
            media("audio", 5)),
        "sample_video_frames": lambda: multimodal.sample_video_frames(
            media("video", 10), every_ms=1000),
        "audio_window_rms": lambda: multimodal.audio_window_rms(
            media("audio", 5), window_ms=1000),
    }
    out = {"sf_dir": sf_dir, "n_input_rows": n_docs,
           "input_mb": round(total_bytes / 1e6, 1), "stages": {}}
    for name, build in stages.items():
        build().toArrow()  # warm
        runs, rows_out = [], None
        for _ in range(3):
            t0 = time.perf_counter()
            arrow = build().toArrow()
            runs.append(time.perf_counter() - t0)
            rows_out = arrow.num_rows
        sec = statistics.median(runs)
        out["stages"][name] = {
            "sec": round(sec, 3), "rows_out": rows_out,
            "input_rows_per_sec": round(n_docs / sec),
            "output_rows_per_sec": round(rows_out / sec),
            "input_mb_per_sec": round(total_bytes / 1e6 / sec, 1),
        }
    (REPO / "BENCH_mm.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
