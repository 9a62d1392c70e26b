#!/usr/bin/env bash
# Run the TPU-only test subset ON THE REAL CHIP and record an auditable
# artifact (VERDICT r3 item 5: hardware coverage was passing but invisible —
# nothing recorded such runs).
#
# The suite normally runs on a virtual 8-device CPU mesh (tests/conftest.py);
# tests marked `skipif(backend != 'tpu')` need GCT_TPU_TESTS=1 to keep the
# container's real-TPU platform.  This script executes that subset and writes
# docs/tpu_tests.json as {test, passed, seconds} records — regenerate it each
# round so hardware regression coverage is auditable, not anecdotal.
#
# Usage:  bash scripts/run_tpu_tests.sh [out.json]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-docs/tpu_tests.json}"

XML=$(mktemp /tmp/tpu_tests_XXXX.xml)
GCT_TPU_TESTS=1 python -m pytest tests/ -q -k tpu --junit-xml="$XML" || true

python - "$XML" "$OUT" <<'EOF'
import json, sys, datetime
import xml.etree.ElementTree as ET
xml, out = sys.argv[1], sys.argv[2]
records = []
for case in ET.parse(xml).getroot().iter('testcase'):
    skipped = case.find('skipped') is not None
    if skipped:
        continue  # the CPU-mesh suite records these; here only on-chip runs
    failed = (case.find('failure') is not None
              or case.find('error') is not None)
    records.append({
        'test': f"{case.get('classname')}::{case.get('name')}",
        'passed': not failed,
        'seconds': round(float(case.get('time', 0)), 2),
    })
doc = {
    'backend_required': 'tpu',
    'generated': datetime.datetime.now(datetime.timezone.utc)
                 .strftime('%Y-%m-%dT%H:%M:%SZ'),
    'command': 'GCT_TPU_TESTS=1 pytest tests/ -k tpu',
    'tests': records,
    'all_passed': bool(records) and all(r['passed'] for r in records),
}
json.dump(doc, open(out, 'w'), indent=1)
print(json.dumps(doc, indent=1))
EOF
