#!/bin/bash
# Build the reference flac binary out-of-tree as a test oracle / bench anchor.
# The reference tree at /root/reference is read-only; build artifacts go to
# /root/repo/.ref_build (gitignored). Produces .ref_build/src/flac/flac.
set -e
BUILD=/root/repo/.ref_build
mkdir -p "$BUILD"
cmake -S /root/reference -B "$BUILD" -G Ninja \
  -DCMAKE_BUILD_TYPE=Release \
  -DBUILD_SHARED_LIBS=OFF \
  -DBUILD_CXXLIBS=OFF \
  -DBUILD_PROGRAMS=ON \
  -DBUILD_EXAMPLES=OFF \
  -DBUILD_TESTING=OFF \
  -DBUILD_DOCS=OFF \
  -DWITH_OGG=OFF \
  -DINSTALL_MANPAGES=OFF > "$BUILD/configure.log" 2>&1
ninja -C "$BUILD" flac metaflac >> "$BUILD/build.log" 2>&1
echo "built: $BUILD/src/flac/flac"
"$BUILD/src/flac/flac" --version
