#!/bin/bash
# Scaling-exponent sweep harness (SCALING.md round-6/round-8 tables).
#
# Usage: tools/scale_sweep.sh [sparse|dense] [OUTROOT]
#   regime  - corpus regime (default: sparse). dense is the stress
#             case (quadratic pair output by construction); sparse is
#             the bounded-cluster regime real corpora live in.
#   OUTROOT - scratch root for corpora + results (default:
#             /dev/shm/graft-scale — tmpfs keeps the scan side off
#             the system disk, mirroring Bench's scratch choice).
#
# Generates 1x/3x/10x corpora (tools/gen_scale_corpus.py), runs the
# 20-query dedup/ANN/components family at each scale with output-row
# recording, and prints the exponent table (time exp = log10-slope of
# the 1x->10x span, output exp likewise). Requires `sbt package`
# having produced target/scala-2.13/classes.
set -euo pipefail
cd "$(dirname "$0")/.."

REGIME="${1:-sparse}"
OUTROOT="${2:-/dev/shm/graft-scale}"
FLAG=""
[ "$REGIME" = "sparse" ] && FLAG="--sparse"
[ "$REGIME" = "skew" ] && FLAG="--skew"

QS="q_cosine_topk,q_ivf_topk,q_ann_topk,q_semantic_dedup,q_ivfpq_topk,q_simhash,q_dedup_exact,q_pq_topk,q_minhash_sig,q_degree_hist,q_simhash_components,q_minhash_lsh_pairs,q_minhash_components,q_incremental_dedup,q_shingle_jaccard,q_embed_components,q_embed_neardup,q_connected_components,q_cluster_best,q_jaccard_neardup"

OPENS=$(for m in java.lang java.lang.invoke java.util java.nio sun.nio.ch \
                 sun.util.calendar java.io java.net java.util.concurrent \
                 sun.security.action; do
          echo --add-opens=java.base/$m=ALL-UNNAMED; done)

for M in 1 3 10; do
  DIR="$OUTROOT/$REGIME$M"
  if [ ! -f "$DIR/documents.parquet" ]; then
    echo "== generating $DIR"
    python3 tools/gen_scale_corpus.py "$DIR" "$M" 42 $FLAG
  fi
  echo "== bench $REGIME ${M}x"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 SPARK_GRAFT_RUNS=1 \
  SPARK_GRAFT_ROWS=1 SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_WARM_DIR="$OUTROOT/${REGIME}1" \
  SPARK_GRAFT_BENCH_OUT="$OUTROOT/bench_$REGIME$M.json" \
  java -Xmx90g -cp "target/scala-2.13/classes:/opt/spark/jars/*" $OPENS \
  graft.Bench > "$OUTROOT/bench_$REGIME$M.log" 2>&1
done

python3 - "$OUTROOT" "$REGIME" <<'EOF'
import json, math, sys
root, regime = sys.argv[1], sys.argv[2]
d = {m: json.load(open(f'{root}/bench_{regime}{m}.json')) for m in (1, 3, 10)}
q1, q3, q10 = d[1]['queries'], d[3]['queries'], d[10]['queries']
r1, r10 = d[1].get('rows', {}), d[10].get('rows', {})
# error check FIRST: Bench omits failed queries from 'queries', so a
# failure at one scale would KeyError the table below before the
# diagnostic that explains it
errs = [d[m].get('n_errors', 0) for m in (1, 3, 10)]
print("errors per scale:", errs)
complete = sorted(set(q1) & set(q3) & set(q10))
dropped = sorted((set(q1) | set(q3) | set(q10)) - set(complete))
if dropped:
    print("MISSING at some scale (failed there):", ", ".join(dropped))
print(f"{'query':24s} {'1x s':>7s} {'3x s':>8s} {'10x s':>8s} {'t-exp':>6s} {'o-exp':>6s}")
for k in sorted(complete, key=lambda k: math.log10(q10[k] / q1[k])):
    te = math.log10(q10[k] / q1[k])
    oe = math.log10(max(r10.get(k, 1), 1) / max(r1.get(k, 1), 1))
    print(f"{k:24s} {q1[k]:7.2f} {q3[k]:8.2f} {q10[k]:8.2f} {te:6.2f} {oe:6.2f}")
assert sum(errs) == 0 and not dropped, \
    "sweep had query errors - exponents above are invalid"
EOF
