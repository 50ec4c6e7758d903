#!/bin/bash
# One-shot TPU measurement session for round 3 (run when the axon tunnel
# is back). Each step is independently time-bounded and appends to the log;
# steps run in dependency order: kernel correctness first, then benches,
# then a fresh head profile for the gap/tail analysis.
set -x
LOG=/tmp/tpu_r3_session.log
cd /root/repo

# Single-core host: never measure while another job (the pytest suite)
# runs — wait for the pid recorded in /tmp/suite.pid to exit first.
if [ -f /tmp/suite.pid ]; then
  while kill -0 "$(cat /tmp/suite.pid)" 2>/dev/null; do sleep 30; done
fi

{
  echo "=== $(date -u) spade_apply8 TPU correctness (real Mosaic compile) ==="
  timeout 900 python tools/verify_serving_tpu.py 2>&1 | tail -4

  echo "=== $(date -u) bench head (exact) ==="
  timeout 900 python bench.py 2>&1 | tail -2

  echo "=== $(date -u) bench --apply8 ==="
  timeout 900 python bench.py --apply8 2>&1 | tail -2

  echo "=== $(date -u) bench --compact_heads ==="
  timeout 900 python bench.py --compact_heads 2>&1 | tail -2

  echo "=== $(date -u) bench --apply8 --compact_heads ==="
  timeout 900 python bench.py --apply8 --compact_heads 2>&1 | tail -2

  echo "=== $(date -u) bench --grouped_heads ==="
  timeout 900 python bench.py --grouped_heads 2>&1 | tail -2

  echo "=== $(date -u) bench --apply8 --grouped_heads ==="
  timeout 900 python bench.py --apply8 --grouped_heads 2>&1 | tail -2

  echo "=== $(date -u) fresh head profile ==="
  rm -rf /tmp/aglayout_prof_r3
  timeout 1200 python tools/profile_ops.py --logdir /tmp/aglayout_prof_r3 --top 60 2>&1 | tail -80

  echo "=== $(date -u) gap analysis at head ==="
  timeout 300 python tools/profile_ops.py --parse_only /tmp/aglayout_prof_r3 --gaps --min_gap_us 5 2>&1 | head -30

  echo "=== $(date -u) done ==="
} >> "$LOG" 2>&1

{
  echo "=== $(date -u) clstm split micro-bench ==="
  timeout 900 python tools/bench_clstm_split.py 2>&1 | tail -5
} >> "$LOG" 2>&1

{
  echo "=== $(date -u) bench 64^2 exact + grouped ==="
  timeout 900 python bench.py --image_size 64 --batch_size 256 2>&1 | tail -2
  timeout 900 python bench.py --image_size 64 --batch_size 256 --grouped_heads 2>&1 | tail -2
} >> "$LOG" 2>&1
