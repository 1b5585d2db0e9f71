#!/bin/bash
# Build & run the reference C++ solver baseline out-of-tree (binary in /tmp;
# nothing is copied into this repo). Writes bench_baseline.json at repo root.
set -e
REF=/root/reference/deps/admm-elastic-sca
REPO=$(cd "$(dirname "$0")/.." && pwd)
BUILD=/tmp/aet_ref_bench
mkdir -p "$BUILD"

STEPS=${1:-5}

g++ -O3 -march=native -fopenmp -std=c++11 \
    -I"$REF/src/system" -I"$REF/src/collision" \
    -I"$REF/deps/Eigen3" -I"$REF/deps/cppoptlib/include" \
    "$REPO/tools/bench_reference.cpp" \
    "$REF/src/system/System.cpp" \
    "$REF/src/system/TetForce.cpp" \
    "$REF/src/system/Force.cpp" \
    "$REF/src/system/AnchorForce.cpp" \
    "$REF/src/system/ExplicitForce.cpp" \
    -o "$BUILD/bench_reference"

g++ -O3 -march=native -fopenmp -std=c++11 \
    -I"$REF/src/system" -I"$REF/src/collision" \
    -I"$REF/deps/Eigen3" -I"$REF/deps/cppoptlib/include" \
    "$REPO/tools/bench_reference_dillo.cpp" \
    "$REF/src/system/System.cpp" \
    "$REF/src/system/TetForce.cpp" \
    "$REF/src/system/Force.cpp" \
    "$REF/src/system/AnchorForce.cpp" \
    "$REF/src/system/ExplicitForce.cpp" \
    -o "$BUILD/bench_reference_dillo"

g++ -O3 -march=native -fopenmp -std=c++11 \
    -I"$REF/src/system" -I"$REF/src/collision" \
    -I"$REF/deps/Eigen3" -I"$REF/deps/cppoptlib/include" \
    "$REPO/tools/bench_reference_cloth.cpp" \
    "$REF/src/system/System.cpp" \
    "$REF/src/system/TetForce.cpp" \
    "$REF/src/system/Force.cpp" \
    "$REF/src/system/AnchorForce.cpp" \
    "$REF/src/system/TriangleForce.cpp" \
    "$REF/src/system/BendForce.cpp" \
    "$REF/src/system/ExplicitForce.cpp" \
    -o "$BUILD/bench_reference_cloth"

T100K=$("$BUILD/bench_reference" "$STEPS" "${@:2}")
DILLO=$("$BUILD/bench_reference_dillo" 10)
CLOTH=$("$BUILD/bench_reference_cloth" 20)
python3 - "$T100K" "$DILLO" "$CLOTH" <<'EOF' | tee "$REPO/bench_baseline.json"
import json, sys
out = {}
for arg in sys.argv[1:]:
    out.update(json.loads(arg))
print(json.dumps(out))
EOF
