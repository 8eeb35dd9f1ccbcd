"""CDC substring-dedup scale smoke with planted offset-shifted copies.

Synthesizes a corpus (default 40k docs x ~1000 chars of uniform
random 27-symbol text, ~40 MB):

- docs 0..M-1 are sources; docs N-M..N-1 each embed a 300-char slice
  of their source at a DIFFERENT, per-pair random offset — the
  arbitrary-offset duplication fixed-chunk dedup cannot see;
- all other docs are independent random text.

Checks (p_dedup_spans_cdc, the registered operator, unchanged):

1. every planted pair is detected on BOTH sides: a reported span
   covering >= 60% of the 300-char region at the right offset
   (CDC edges under-extend by up to ~one chunk per side);
2. ZERO false positives: no unplanted doc reports any span — with
   the FastCDC min-chunk bound, a false span needs >= CDC_MIN_SPAN
   consecutive chars of coincidentally-duplicated >= 8-char chunks
   (probability ~27^-40 per site);
3. wall time for the full corpus.

Usage: python scripts/exp_cdc_spans_scale.py [n_docs] [n_planted]
"""

from __future__ import annotations

import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np

from matrixinversion_spark.pipeline.dedup import p_dedup_spans_cdc
from matrixinversion_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
N_PLANT = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
DOC_LEN, REGION = 1_000, 300
ALPHABET = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", dtype=np.uint8)

rng = np.random.default_rng(42)
off_rng = random.Random(43)

chars = ALPHABET[rng.integers(0, len(ALPHABET), size=N_DOCS * DOC_LEN)]
texts = [
    chars[i * DOC_LEN : (i + 1) * DOC_LEN].tobytes().decode()
    for i in range(N_DOCS)
]

planted = {}  # doc_id -> (offset, region_text)
for p in range(N_PLANT):
    src, dst = p, N_DOCS - N_PLANT + p
    s_off = off_rng.randrange(0, DOC_LEN - REGION)
    d_off = off_rng.randrange(0, DOC_LEN - REGION)
    region = texts[src][s_off : s_off + REGION]
    texts[dst] = (
        texts[dst][:d_off] + region + texts[dst][d_off + REGION :]
    )
    planted[src] = (s_off, region)
    planted[dst] = (d_off, region)

spark = get_spark("cdc-spans-scale")
tmp = tempfile.mkdtemp(prefix="cdc_spans_scale_")
try:
    spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    ).write.parquet(f"{tmp}/documents.parquet")

    t0 = time.time()
    spans = p_dedup_spans_cdc(spark, tmp).collect()
    wall = time.time() - t0

    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)

    false_pos = sorted(set(by_doc) - set(planted))
    missed = []
    for doc_id, (off, _region) in planted.items():
        best = 0
        for r in by_doc.get(doc_id, []):
            lo = max(r["span_start"] - 1, off)  # spans are 1-indexed
            hi = min(r["span_start"] - 1 + r["span_len"], off + REGION)
            best = max(best, hi - lo)
        if best < 0.6 * REGION:
            missed.append((doc_id, best))

    print(
        f"cdc_spans: docs={N_DOCS} planted_docs={len(planted)} "
        f"detected={len(planted) - len(missed)} missed={len(missed)} "
        f"false_pos={len(false_pos)} wall={wall:.1f}s"
    )
    if missed[:5]:
        print("  sample missed:", missed[:5])
    if false_pos[:5]:
        print("  sample false positives:", false_pos[:5])
    ok = not missed and not false_pos
    print(f"ok={ok}")
    if not ok:
        sys.exit(1)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
