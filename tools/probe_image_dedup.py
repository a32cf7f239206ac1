"""Scale probe for perceptual image near-dup (image_dhash +
hamming_fp_pairs): the mm_phash_neardup GATE is deliberately
oracle-sized (500 images, all-pairs DuckDB ground truth); this probe
measures the production path at growing corpus sizes -- synthetic 9x8
BMPs (one per id, every 5th id cloned with a one-pixel perturbation),
Arrow-batched decode+dhash, pigeonhole-banded Hamming pairing. Planted
twins give a recall pin at every scale (n/5 expected pairs at
hamming<=3; organic sha256-derived images essentially never collide).

Usage: python tools/probe_image_dedup.py [n1 n2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["BODO_SPARK_EXACT"] = "0"


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [5000, 50000, 500000]
    from pyspark.sql import functions as F

    from bodo_spark.operators import multimodal as M
    from bodo_spark.operators import dedup as D
    from bodo_spark.session import get_spark

    spark = get_spark(app_name="probe_image_dedup")
    for n in sizes:
        base = spark.range(n).select(F.col("id").alias("doc_id"))
        imgs = M.attach_bmp_media(base, "doc_id", width=9, height=8)
        clones = (M.perturb_pixels(
            imgs.where(F.col("doc_id") % 5 == 0), delta=17)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
        corpus = imgs.unionByName(clones)
        t0 = time.time()
        fp = M.image_dhash(corpus, id_col="doc_id")
        pairs = D.hamming_fp_pairs(fp, bits=64, bands=4, max_hamming=3,
                                   id_col="doc_id", fp_col="dhash")
        twin = pairs.where(
            F.col("id_b") - F.col("id_a") == 10_000_000).count()
        sec = round(time.time() - t0, 2)
        D.unpersist_cached()
        spark.catalog.clearCache()
        expected = n // 5 + (1 if n % 5 else 0)
        print(json.dumps({"n_images": n + expected, "twin_pairs": twin,
                          "expected_twins": expected,
                          "twins_ok": twin >= expected, "sec": sec}),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
