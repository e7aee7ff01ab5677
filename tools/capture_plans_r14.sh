#!/bin/bash
# Capture .explain("formatted") output for the r14-touched queries, split
# into plans/r14/<query>_<tag>.txt. Usage:
#   tools/capture_plans_r14.sh <worktree> <tag> [sfDir]
# e.g. tools/capture_plans_r14.sh /root/repo_before before
#      tools/capture_plans_r14.sh /root/repo after
set -e
WT=${1:?worktree}
TAG=${2:?tag}
SF=${3:-/root/testdata/sf0.1}
OUT=/root/repo/plans/r14
mkdir -p "$OUT"
QUERIES="text_tfidf text_surprisal text_bigram_perplexity text_repetition \
text_select_budget_threshold text_span_dedup dedup_minhash_lsh \
dedup_components text_prepare_corpus"
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
