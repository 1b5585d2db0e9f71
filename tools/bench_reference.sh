#!/bin/bash
# Build & run the reference C++ solver baselines out-of-tree (binary in /tmp;
# nothing is copied into this repo). Merges results into bench_baseline.json
# at the repo root (preserving keys it does not re-measure).
#
# Usage: tools/bench_reference.sh [steps] [target ...]
#   targets: tet100k dillo windyflag bunny plinko cloth100k  (default: all)
set -e
REF=/root/reference/deps/admm-elastic-sca
REPO=$(cd "$(dirname "$0")/.." && pwd)
BUILD=/tmp/aet_ref_bench
mkdir -p "$BUILD"

STEPS=${1:-5}
shift || true
TARGETS=${@:-"tet100k dillo windyflag bunny plinko cloth100k"}

CORE_SRCS="$REF/src/system/System.cpp $REF/src/system/TetForce.cpp \
  $REF/src/system/Force.cpp $REF/src/system/AnchorForce.cpp \
  $REF/src/system/ExplicitForce.cpp"
INC="-I$REF/src/system -I$REF/src/collision -I$REF/deps/Eigen3 \
  -I$REF/deps/cppoptlib/include"

cc() {  # cc <output> <sources...>
  out=$1; shift
  g++ -O3 -march=native -fopenmp -std=c++11 $INC "$@" -o "$BUILD/$out"
}

RESULTS=()
for t in $TARGETS; do
  case $t in
    tet100k)
      cc bench_reference "$REPO/tools/bench_reference.cpp" $CORE_SRCS
      RESULTS+=("$("$BUILD/bench_reference" "$STEPS")");;
    dillo)
      cc bench_reference_dillo "$REPO/tools/bench_reference_dillo.cpp" $CORE_SRCS
      RESULTS+=("$("$BUILD/bench_reference_dillo" 10)");;
    windyflag)
      cc bench_reference_cloth "$REPO/tools/bench_reference_cloth.cpp" \
        $CORE_SRCS "$REF/src/system/TriangleForce.cpp" "$REF/src/system/BendForce.cpp"
      RESULTS+=("$("$BUILD/bench_reference_cloth" 20)");;
    bunny|plinko|cloth100k)
      cc bench_reference_scenes "$REPO/tools/bench_reference_scenes.cpp" \
        $CORE_SRCS "$REF/src/system/TriangleForce.cpp" \
        "$REF/src/system/BendForce.cpp" "$REF/src/system/CollisionForce.cpp"
      n=10; [ "$t" = cloth100k ] && n=5
      RESULTS+=("$("$BUILD/bench_reference_scenes" "$t" "$n")");;
    *) echo "unknown target $t" >&2; exit 1;;
  esac
done

BASEFILE="$REPO/bench_baseline.json" python3 - "${RESULTS[@]}" <<'EOF' | tee "$REPO/bench_baseline.json.tmp" && mv "$REPO/bench_baseline.json.tmp" "$REPO/bench_baseline.json"
import json, os, sys
out = {}
p = os.environ["BASEFILE"]
if os.path.exists(p):
    out.update(json.load(open(p)))
for arg in sys.argv[1:]:
    out.update(json.loads(arg))
print(json.dumps(out))
EOF
