#!/bin/bash
set -x
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32

TARGETS="q82_pagerank_supply,q140_personalized_pagerank,q194_countmin_frequency,q128_tokenize_pack,q120_bpe_encode,q204_bpe_decode_roundtrip,q184_pretrain_capstone_v2,q188_bm25_maxscore,q189_bm25_champion_lists,q155_cc_incremental,q183_stream_ivf_maintain,q195_ann_store_rtbf,q192_ivf_pq_search,q134_ann_recall,q119_leakage_safe_split,q201_mmr_batch_serving,q211_label_propagation,q129_stream_outer_join,q202_sequential_patterns"

# 1. before-plans
sbt -batch "runMain graft.PlanDump /root/testdata/sf0.1 /root/repo/tmp/plans_before $TARGETS" > /root/repo/tmp/plandump_before.log 2>&1

# 2. baseline subset bench at r16 HEAD
SPARK_GRAFT_BENCH_ONLY="$TARGETS" SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_before_targets.json \
  sbt -batch "runMain graft.Bench" > /root/repo/tmp/bench_before.log 2>&1

# 3. r15 worktree A/B for the graph family
git worktree add /root/repo-r15 42596ff 2>/dev/null || true
cd /root/repo-r15
SPARK_GRAFT_BENCH_ONLY="q82_pagerank_supply,q140_personalized_pagerank,q194_countmin_frequency" \
  SPARK_GRAFT_BENCH_OUT=/root/repo/tmp/BENCH_r15_graph.json \
  sbt -batch "runMain graft.Bench" > /root/repo/tmp/bench_r15_graph.log 2>&1
echo DONE > /root/repo/tmp/measure_before.done
