#!/bin/bash
# Capture .explain("formatted") output for the r13-touched queries, split
# into plans/r13/<query>_<tag>.txt. Usage:
#   tools/capture_plans.sh <worktree> <tag> [sfDir]
# e.g. tools/capture_plans.sh /root/repo_before before
#      tools/capture_plans.sh /root/repo after
set -e
WT=${1:?worktree}
TAG=${2:?tag}
SF=${3:-/root/testdata/sf0.1}
OUT=/root/repo/plans/r13
mkdir -p "$OUT"
QUERIES="dedup_minhash_lsh dedup_components dedup_components_incremental \
dedup_survivors_weighted dedup_tune_bands dedup_tune_embedding \
text_span_dedup text_decontaminate text_tfidf text_surprisal \
text_bigram_perplexity profile_drift_multi profile_distribution_drift \
profile_categorical_drift text_prepare_corpus text_split_leakage_safe \
text_quality text_lang_id text_curate_corpus \
ann_pq_topk ann_opq_topk ann_ivfpq_topk ann_ivfpq_residual_topk"
cd "$WT"
sbt -batch "runMain graft.Explain $SF $QUERIES" > /tmp/plans_$TAG.raw 2>/dev/null
python3 - "$TAG" "$OUT" <<'EOF'
import re, sys
tag, out = sys.argv[1], sys.argv[2]
raw = open(f"/tmp/plans_{tag}.raw").read()
parts = re.split(r"=+ (\w+) =+\n", raw)
# parts: [prefix, name1, body1, name2, body2, ...]
for i in range(1, len(parts) - 1, 2):
    name, body = parts[i], parts[i + 1]
    # strip sbt [info]/[error] noise lines
    lines = [l for l in body.splitlines()
             if not l.startswith("[") or l.startswith("[error] ==")]
    open(f"{out}/{name}_{tag}.txt", "w").write("\n".join(lines).strip() + "\n")
    print("wrote", f"{out}/{name}_{tag}.txt")
EOF
