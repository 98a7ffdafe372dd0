#!/bin/bash
# Build the reference OrcVIO C++ (from /root/reference, unmodified sources)
# into a benchmark binary. Dependency substitutions (see shim/):
#   Eigen        -> tensorflow's bundled Eigen headers
#   Sophus       -> shim (only SO3d/SE3d::exp().matrix() is used)
#   boost        -> shims (shared_ptr -> std::shared_ptr; chi_squared quantile
#                   implemented via inverse incomplete gamma)
#   SuiteSparse  -> SPQRSupport shim backed by Eigen dense Householder QR
#   Ceres        -> compile-only stub (dynamic init unused: EuRoC starts static)
#   Pangolin     -> avoided entirely (refbench_main.cpp has no viewer)
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference
EIGEN=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)
OPENCV_CFLAGS=$(pkg-config --cflags opencv4)
OPENCV_LIBS=$(pkg-config --libs opencv4)

mkdir -p build
CXX=${CXX:-g++}
# -mno-avx512fp16: TF's bundled Eigen trips a template bug when the host
# exposes AVX512-FP16; fp16 SIMD is unused by this double-precision code.
# -include cassert/cstdint: the reference relies on transitive includes that
# newer toolchain headers no longer provide.
FLAGS="-O3 -march=native -mno-avx512fp16 -DNDEBUG -std=c++17 -fopenmp -w -include cassert -include cstdint"
INC="-Ishim -I$REF/include -I$EIGEN $OPENCV_CFLAGS"

compile() {
  local src=$1 obj=$2
  if [ ! -f "build/$obj" ] || [ "$src" -nt "build/$obj" ] || [ refbench_main.cpp -ot shim ]; then
    echo "CXX $src"
    $CXX $FLAGS $INC -c "$src" -o "build/$obj"
  fi
}

compile $REF/src/image_processor.cpp image_processor.o
compile $REF/src/ORBDescriptor.cpp ORBDescriptor.o
compile $REF/src/StaticInitializer.cpp StaticInitializer.o
compile $REF/src/DynamicInitializer.cpp DynamicInitializer.o
compile $REF/src/feature_manager.cpp feature_manager.o
compile $REF/src/initial_alignment.cpp initial_alignment.o
compile $REF/src/initial_sfm.cpp initial_sfm.o
compile $REF/src/solve_5pts.cpp solve_5pts.o
compile $REF/src/FlexibleInitializer.cpp FlexibleInitializer.o
compile $REF/src/orcvio.cpp orcvio.o
compile refbench_main.cpp refbench_main.o

echo "LINK build/refbench"
$CXX $FLAGS build/*.o -o build/refbench $OPENCV_LIBS
echo OK
