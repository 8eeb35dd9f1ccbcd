"""Codec-throughput scale probe: push N synthetic documents through
each REAL pure-Python image/audio codec inside the same Arrow-batched
mapInPandas pipeline the registered queries use, and report docs/sec.

The 100 TB relevance: the multimodal design keeps payload bytes and
decoded pixel arrays inside one Python worker (zero shuffle bytes —
see PLANS.md p_multimodal_decode_*_real), so codec CPU is the ONLY
cost that scales with corpus size, and it scales with executor count.
This probe measures that per-core unit cost honestly on local[32];
a cluster deployment multiplies the same number by its core count
(or swaps a C codec behind the same decode_image_real seam).

Usage: python scripts/exp_codec_scale.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from matrixinversion_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

spark = get_spark("codec-scale")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.range(N).withColumnRenamed("id", "doc_id")
docs = docs.repartition(32).cache()
docs.count()


def synth_and_decode(codec: str):
    import pandas as pd

    def run(batches):
        import numpy as np

        from matrixinversion_spark.pipeline import multimodal as mm

        for pdf in batches:
            n_px = 0
            for i in pdf["doc_id"]:
                i = int(i)
                if codec == "png":
                    r = np.arange(16)[:, None]
                    c = np.arange(24)[None, :]
                    px = ((i * 31 + 7 * r + 13 * c) % 256)
                    out = mm.decode_png_pixels(
                        mm.encode_png(px.astype(np.uint8))
                    )
                elif codec == "jpeg":
                    b = np.arange(6, dtype=np.int64).reshape(2, 3)
                    v = (i * 31 + 17 * b) % 256
                    img = np.repeat(np.repeat(v, 8, 0), 8, 1)
                    out = mm.decode_jpeg_pixels(
                        mm.encode_jpeg(img.astype(np.uint8))
                    )
                elif codec == "gif":
                    pal = np.stack(
                        [(i * 7 + np.arange(8) * 29) % 256,
                         (i * 11 + np.arange(8) * 31) % 256,
                         (i * 13 + np.arange(8) * 37) % 256], axis=1
                    )
                    r = np.arange(6)[:, None]
                    c = np.arange(6)[None, :]
                    frames = [(i + f * 5 + r * 3 + c) % 8
                              for f in range(2)]
                    out = mm.decode_gif_frames(
                        mm.encode_gif_animation(frames, pal)
                    )
                elif codec == "avi":
                    b = np.arange(2, dtype=np.int64).reshape(1, 2)
                    jpegs = []
                    for f in range(2):
                        v = (i * 31 + 23 * f + 17 * b) % 256
                        img = np.repeat(np.repeat(v, 8, 0), 8, 1)
                        jpegs.append(
                            mm.encode_jpeg(img.astype(np.uint8))
                        )
                    out = mm.decode_avi_frames(
                        mm.encode_avi_mjpeg(jpegs, 16, 8)
                    )
                else:  # wav
                    s = np.arange(200, dtype=np.int64) * 97 % 4001
                    out = mm.decode_wav_samples(mm.synth_wav(s - 2000))
                n_px += out.size
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n": [n_px] * len(pdf)}
            )

    return run


for codec in ("png", "gif", "jpeg", "avi", "wav"):
    t0 = time.time()
    total = docs.mapInPandas(
        synth_and_decode(codec), "doc_id bigint, n bigint"
    ).count()
    wall = time.time() - t0
    assert total == N
    print(
        f"codec_scale {codec}: {N} docs in {wall:.1f}s "
        f"= {N / wall:,.0f} docs/s on local[32] "
        f"({N / wall / 32:,.0f}/s/core, encode+decode both counted)"
    )
spark.stop()
