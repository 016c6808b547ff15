#!/bin/bash
# Build the reference pacbiokit4b binary (.refbin/pacbiokit4b) for the
# realistic-scale ecreads comparison (tools/pacbio_scale.py --ref).
# Same direct-g++ recipe as tools/build_reference.sh (no autotools in image).
set -e
REF=/root/reference
OUT=/root/repo/.refbin
BUILD=$(mktemp -d /tmp/pbbuild.XXXX)
mkdir -p "$OUT" "$BUILD"/{obj,zobj}
cd "$REF"
LIBSRC="AlignValidate.cpp argtable3.cpp BEDfile.cpp BioSeqFile.cpp Centroid.cpp Conformation.cpp ConfSW.cpp CSVFile.cpp CVS2BED.cpp DataPoints.cpp Diagnostics.cpp Endian.cpp ErrorCodes.cpp Fasta.cpp FeatLoci.cpp FilterLoci.cpp FilterRefIDs.cpp GOAssocs.cpp GOTerms.cpp SimReads.cpp HashFile.cpp HyperEls.cpp GFFFile.cpp GTFFile.cpp Contaminants.cpp MAlignFile.cpp Random.cpp SimpleRNG.cpp RsltsFile.cpp sais.cpp SAMfile.cpp SeqTrans.cpp SfxArray.cpp CPBASfxArray.cpp Shuffle.cpp SmithWaterman.cpp NeedlemanWunsch.cpp Stats.cpp StopWatch.cpp Twister.cpp Utility.cpp ProcRawReads.cpp MTqsort.cpp bgzf.cpp CBlitz.cpp CSQLitePSL.cpp"
par() { while [ "$(jobs -r | wc -l)" -ge 2 ]; do wait -n; done; }
for f in $LIBSRC; do
  g++ -O2 -std=c++14 -w -c libkit4b/$f -o "$BUILD/obj/lib_${f%.cpp}.o" -I hdrs -I . -D_GNU_SOURCE & par
done
for f in pacbiokit4b/*.cpp; do
  b=$(basename "$f" .cpp)
  g++ -O2 -std=c++14 -w -c "$f" -o "$BUILD/obj/pb_$b.o" -I hdrs -I . -I libkit4b -D_GNU_SOURCE & par
done
for f in libzlib/*.c; do
  gcc -O2 -w -c "$f" -o "$BUILD/zobj/$(basename "$f" .c).o" -I libzlib & par
done
wait
g++ -O2 -o "$OUT/pacbiokit4b" "$BUILD"/obj/*.o "$BUILD"/zobj/*.o \
    -lpthread -lm -ldl /usr/lib/x86_64-linux-gnu/libsqlite3.so.0
rm -rf "$BUILD"
echo "built $OUT/pacbiokit4b"
