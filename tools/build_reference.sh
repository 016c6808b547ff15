#!/bin/bash
# Build the reference ngskit4b binary (for baseline measurement and
# golden-output equivalence tests). Produces .refbin/ngskit4b.
# The image lacks autotools, so this compiles the canonical source lists from
# the reference Makefile.am directly; vendored zlib/PLplot build as C, sqlite
# uses the system shared library (the amalgamation .c is absent upstream).
set -e
REF=${1:-/root/reference}
OUT=$(cd "$(dirname "$0")/.." && pwd)/.refbin
BUILD=$(mktemp -d /tmp/refbuild.XXXX)
mkdir -p "$OUT" "$BUILD"/{obj,zobj,pobj}
cd "$REF"

LIBSRC="AlignValidate.cpp argtable3.cpp BEDfile.cpp BioSeqFile.cpp Centroid.cpp Conformation.cpp ConfSW.cpp CSVFile.cpp CVS2BED.cpp DataPoints.cpp Diagnostics.cpp Endian.cpp ErrorCodes.cpp Fasta.cpp FeatLoci.cpp FilterLoci.cpp FilterRefIDs.cpp GOAssocs.cpp GOTerms.cpp SimReads.cpp HashFile.cpp HyperEls.cpp GFFFile.cpp GTFFile.cpp Contaminants.cpp MAlignFile.cpp Random.cpp SimpleRNG.cpp RsltsFile.cpp sais.cpp SAMfile.cpp SeqTrans.cpp SfxArray.cpp CPBASfxArray.cpp Shuffle.cpp SmithWaterman.cpp NeedlemanWunsch.cpp Stats.cpp StopWatch.cpp Twister.cpp Utility.cpp ProcRawReads.cpp MTqsort.cpp bgzf.cpp CBlitz.cpp CSQLitePSL.cpp"

par() { while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done; }

for f in $LIBSRC; do
  g++ -O2 -std=c++14 -w -c libkit4b/$f -o "$BUILD/obj/lib_${f%.cpp}.o" -I hdrs -I . -D_GNU_SOURCE & par
done
for f in ngskit4b/*.cpp; do
  b=$(basename "$f" .cpp)
  g++ -O2 -std=c++14 -w -c "$f" -o "$BUILD/obj/ngs_$b.o" -I hdrs -I . -I libkit4b -D_GNU_SOURCE & par
done
for f in libzlib/*.c; do
  gcc -O2 -w -c "$f" -o "$BUILD/zobj/$(basename "$f" .c).o" -I libzlib & par
done
for f in libBKPLPlot/*.cpp; do
  b=$(basename "$f" .cpp)
  [ "$b" = BKPlots ] && continue  # second main()
  g++ -O2 -std=c++14 -w -D_O_SHORT_LIVED=0 -D_O_TEMPORARY=0 -DO_BINARY=0 \
      -c "$f" -o "$BUILD/pobj/p_$b.o" -I libBKPLPlot -I hdrs -I . & par
done
wait
g++ -O2 -o "$OUT/ngskit4b" "$BUILD"/obj/*.o "$BUILD"/zobj/*.o "$BUILD"/pobj/*.o \
    -lpthread -lm -ldl /usr/lib/x86_64-linux-gnu/libsqlite3.so.0
rm -rf "$BUILD"
echo "built $OUT/ngskit4b"
