#!/usr/bin/env bash
# Round-close correctness gate (round-12 verdict item 1): produce and commit
# the round's OWN full oracle record so the round can never go signal-less
# (CORRECTNESS_r12.json shipped from the driver as an empty `{}` and nothing
# in the close flow noticed).
#
# Usage: tools/round_close.sh <round-number> [sfDir]
#
# Runs graft.Verify over ALL queries at sf0.01, replays every oracle in
# DuckDB via tools/check_oracle.py, writes correctness/r{N}_close.json, and
# FAILS LOUDLY unless the record is non-empty and every entry is green.
# Commit the artifact after a green run.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: tools/round_close.sh <round-number> [sfDir]}"

# Refuse a dirty working tree up front (round-15): the record pins HEAD,
# and a dirty tree means HEAD is not what the dump would measure.
if [[ -n "$(git status --porcelain)" ]]; then
  echo "[round-close] REFUSING: working tree is dirty — commit first:" >&2
  git status --porcelain >&2
  exit 3
fi
SF_DIR="${2:-/root/testdata/sf0.01}"
OUT_DIR="$(mktemp -d /tmp/verify_close_rXXXX)"
ART_DIR="correctness"
ART="$ART_DIR/r${ROUND}_close.json"
mkdir -p "$ART_DIR"

echo "[round-close] dumping all queries at $SF_DIR -> $OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "[round-close] oracle replay -> $ART"
python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR" --json "$ART"

# check_oracle exits nonzero on any failure and refuses an empty record;
# belt-and-braces: assert the committed artifact is non-empty and all_ok.
python3 - "$ART" <<'EOF'
import json, subprocess, sys
rec = json.load(open(sys.argv[1]))
assert rec.get("queries"), f"{sys.argv[1]} has an EMPTY query map"
assert rec.get("all_ok") is True, f"{sys.argv[1]} has failures: n_fail={rec.get('n_fail')}"
head = subprocess.check_output(["git", "rev-parse", "HEAD"], text=True).strip()
assert rec.get("commit") == head, (
    f"{sys.argv[1]} certifies commit {rec.get('commit')}, but HEAD is {head} — "
    "re-run the close after the final code commit")
assert rec.get("dirty") is not True, (
    f"{sys.argv[1]} was produced on a DIRTY tree — its commit pin is not "
    "what was measured; commit and re-run")
print(f"[round-close] {sys.argv[1]}: {rec['n_queries']} queries, all green @ {head[:12]}")
EOF

echo "[round-close] OK — now: git add $ART && git commit"
