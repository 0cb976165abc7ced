#!/bin/bash
# Round-16 register regeneration, run AFTER the sf10 full bench completes.
# Steps: (1) isolated sf0.1 min-of-3 for the new/rewired five, (2) merged
# sf0.1 view for the curve, (3) BENCH_SCALE_SF10 + BENCH_SCALE_CURVE,
# (4) recall probe. Baselines and _doc adjudications are applied by hand.
set -euo pipefail
cd "$(dirname "$0")/.."

FIVE="q_image_neardup,q_kafka_wire_compacted,q_ann_ivf_adaptive,q_decontaminate,q_pack_sequences"

echo "== isolated sf0.1 min-of-3 for: $FIVE"
GRAFT_CLASSES=/root/repo/target/bench-classes-r16 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_ONLY="$FIVE" \
tools/run.sh graft.Bench | grep -E '"metric"' > target/bench_sf01_five_r16.json
cat target/bench_sf01_five_r16.json

echo "== merged sf0.1 view (r15 canonical + the five spliced)"
python3 - << 'EOF'
import json
full = json.load(open('BENCH_FULL.json'))
five = json.load(open('target/bench_sf01_five_r16.json'))
full['queries'].update(five['queries'])
full['_splice_note_r16'] = (
    "curve input only, NOT the canonical record: r15 BENCH_FULL.json with "
    "five r16 entries spliced from an isolated same-boot min-of-3 "
    f"(probe {five['probe_sec']}) - the three new r16 queries plus the two "
    "rewired ones (q_decontaminate, q_pack_sequences) whose r15 sf0.1 "
    "entries predate the rewires")
json.dump(full, open('target/bench_sf01_merged_r16.json', 'w'), indent=1)
print('wrote target/bench_sf01_merged_r16.json')
EOF

echo "== BENCH_SCALE_SF10.json (second decade, sf10 vs sf1.0)"
python3 tools/check_scale.py BENCH_FULL_sf10.json BENCH_FULL_sf1.0.json BENCH_SCALE_SF10.json | tail -15

echo "== BENCH_SCALE_CURVE.json (three-point, full catalog)"
python3 tools/check_curve.py target/bench_sf01_merged_r16.json BENCH_FULL_sf1.0.json BENCH_FULL_sf10.json BENCH_SCALE_CURVE.json | tail -20

echo "== recall probe (6 regime rows; clustered dirs cached)"
GRAFT_CLASSES=/root/repo/target/bench-classes-r16 \
tools/run.sh graft.cli.RecallProbe 2>/dev/null | grep -E '^\{"dir' > RECALL_SCALE_r16.jsonl
cat RECALL_SCALE_r16.jsonl
