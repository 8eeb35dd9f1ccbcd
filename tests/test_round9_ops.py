"""Round-9 hardening tests: LSH mega-bucket skew guard, shared
MinHash signature cache, and the bloom-prefilter plan-shape pin."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLshBucketGuard:
    def test_oversized_bucket_dropped_and_reported(self, spark):
        from matrixinversion_spark.pipeline.dedup import (
            lsh_bands,
            lsh_bucket_guard,
            minhash_signatures,
        )

        # 20 byte-identical docs (one mega-cluster: identical signature
        # → same bkey in EVERY band) + one near-dup pair with a
        # distinct vocabulary so its buckets never collide with the
        # cluster's.
        mega = [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)]
        base = "red orange yellow green blue indigo violet umber"
        pair = [(100, base + " one"), (101, base + " two")]
        sig = minhash_signatures(_docs(spark, mega + pair))
        bands = lsh_bands(sig)

        kept, oversized = lsh_bucket_guard(bands, max_bucket=10)
        over = oversized.collect()
        # the identical cluster occupies one bucket per band, all size 20
        assert len(over) == 4  # N_BANDS
        assert all(r.n_members == 20 for r in over)
        # every kept row belongs to the near-dup pair, none to the cluster
        kept_ids = {r.doc_id for r in kept.collect()}
        assert kept_ids <= {100, 101}
        assert {100, 101} <= kept_ids

    def test_guarded_pairs_bounded(self, spark):
        from matrixinversion_spark.pipeline.dedup import (
            minhash_lsh_pairs,
            minhash_signatures,
        )

        mega = [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)]
        base = "red orange yellow green blue indigo violet umber"
        pair = [(100, base + " one"), (101, base + " two")]
        sig = minhash_signatures(_docs(spark, mega + pair))

        unguarded = minhash_lsh_pairs(sig).count()
        assert unguarded == 20 * 19 // 2 + 1  # C(20,2) cluster + the pair

        guarded = minhash_lsh_pairs(sig, max_bucket=10).collect()
        assert [(r.id_a, r.id_b) for r in guarded] == [(100, 101)]

    def test_guard_is_noop_below_cap(self, spark):
        from matrixinversion_spark.pipeline.dedup import (
            lsh_bands,
            lsh_bucket_guard,
            minhash_signatures,
        )

        rows = [(i, f"unique doc number {i} with words {i * 7}")
                for i in range(12)]
        sig = minhash_signatures(_docs(spark, rows))
        bands = lsh_bands(sig)
        kept, oversized = lsh_bucket_guard(bands, max_bucket=50)
        assert oversized.count() == 0
        assert kept.count() == bands.count()


class TestSharedSignatureCache:
    def test_cache_returns_same_frame_and_clears(self, spark):
        from matrixinversion_spark.pipeline import dedup

        dedup.clear_signature_cache()
        s1 = dedup.shared_doc_signatures(spark, SF_DIR)
        s2 = dedup.shared_doc_signatures(spark, SF_DIR)
        assert s1 is s2
        assert s1.storageLevel.useMemory  # persisted
        dedup.clear_signature_cache()
        s3 = dedup.shared_doc_signatures(spark, SF_DIR)
        assert s3 is not s1
        dedup.clear_signature_cache()

    def test_shared_matches_fresh(self, spark):
        """The cached signature frame is bit-identical to a fresh
        uncached build (guards against cache-key or projection drift)."""
        from matrixinversion_spark.pipeline import dedup
        from matrixinversion_spark.session import read_table

        dedup.clear_signature_cache()
        cached = dedup.shared_doc_signatures(spark, SF_DIR)
        fresh = dedup.minhash_signatures(read_table(spark, SF_DIR, "documents"))
        assert cached.exceptAll(fresh).count() == 0
        assert fresh.exceptAll(cached).count() == 0
        dedup.clear_signature_cache()


class TestBloomPlanShape:
    """Pin the bloom-prefilter join's plan shape (r8 VERDICT nit #1):
    the collected word set must reach the probe side as a broadcast
    (LocalTableScan → BroadcastExchange), and the probe side must not
    shuffle — so a wall-clock swing at this fingerprint is machine
    load, never a plan regression."""

    def test_bloom_semi_filter_zero_probe_shuffles(self, spark):
        from matrixinversion_spark.relational.bloomjoin import (
            bloom_semi_filter,
        )
        from matrixinversion_spark.session import read_table

        li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey")
        o = (
            read_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_orderkey")
        )
        df = bloom_semi_filter(li, "l_orderkey", o, "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the word set is driver-collected (surfaces as a
        # LocalTableScan or an ExistingRDD scan of the collected rows)
        # and re-broadcast for each of the k=3 probes
        assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
        assert plan.count("BroadcastHashJoin") >= 3
        # the probe side takes ZERO shuffles — no Exchange other than
        # the broadcasts, no sort-merge join anywhere
        assert "ShuffleExchange" not in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" not in plan

    def test_bloom_full_query_fact_side_unshuffled_prefilter(self, spark):
        import __spark_entry__ as entry_mod

        df = entry_mod.queries()["q_bloom_prefilter_join"](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
        assert plan.count("BroadcastHashJoin") >= 3
