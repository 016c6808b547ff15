"""Command-line interface — reference-compatible subcommands and flags.

Mirrors the ngskit4b dispatch model (ngskit4b/ngskit4b.cpp:136-190 subprocess
table, :275 main) with the same flag letters for the north-star subcommands
(SURVEY.md §5.6: flag semantics preserved; help text not byte-matched).
Response files (@params.txt) are supported via argparse fromfile support,
matching argtable3's @file convention.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-F", "--log", dest="logfile", default=None,
                   help="diagnostics log file")
    p.add_argument("-f", "--loglevel", dest="loglevel", default="info",
                   help="log level (none|info|debug)")


def cmd_index(args) -> int:
    """ngskit4b index equivalent (kit4bax.cpp:73 kingsax)."""
    from .index.sfx_index import SfxIndex
    from .io.fasta import Genome
    from .utils.runtime import PhaseTimer, log
    t = PhaseTimer()
    with t.phase("load genome"):
        g = Genome.load(*args.infile)
    with t.phase("build suffix index"):
        idx = SfxIndex.build(g)
    with t.phase("write index"):
        idx.save(args.outfile)
    log.info("index: %d seqs, %d bp, lut_k=%d, %d clean suffixes -> %s",
             g.nchroms(), g.total_len, idx.lut_k, len(idx.sa_clean),
             args.outfile)
    return 0


def cmd_simreads(args) -> int:
    """ngskit4b simreads equivalent (libkit4b/SimReads.cpp)."""
    from .io.fasta import Genome
    from .sim import simreads
    g = Genome.load(args.infile)
    params = simreads.SimParams(
        n_reads=args.nreads, read_len=args.length,
        pe=args.pe is not None,
        pe_insert_min=args.insertmin, pe_insert_max=args.insertmax,
        error_mode=args.errmode, subs_rate=args.subsrate,
        strand=("watson" if args.strand == "+" else "both"),
        seed=args.seed)
    out = simreads.sim_reads(g, params)
    fmt = "fastq" if args.fastq else "fasta"
    if params.pe:
        r1, r2 = out
        simreads.write_reads(args.outfile, r1, fmt)
        simreads.write_reads(args.outpe, r2, fmt)
        print(f"simreads: wrote {len(r1)} pairs")
    else:
        simreads.write_reads(args.outfile, out, fmt)
        print(f"simreads: wrote {len(out)} reads")
    return 0


def cmd_kalign(args) -> int:
    """ngskit4b kalign equivalent (KAlignerCL.cpp / KAligner.cpp)."""
    from .align import kalign, snp
    from .index.sfx_index import SfxIndex
    from .io.fasta import read_seqs
    from .io.wig import write_wig
    from .utils.runtime import PhaseTimer, enable_compile_cache, log
    enable_compile_cache()
    t = PhaseTimer()
    with t.phase("load index"):
        idx = SfxIndex.load(args.sfxfile)
    sens = {0: "default", 1: "more", 2: "ultra", 3: "less"}[args.mode]
    al = kalign.KAligner(idx, max_subs=args.substitutions,
                         mm_delta=args.editdelta, max_ml=args.maxmulti,
                         max_ns=args.maxns, batch_size=args.batchsize,
                         sens=sens)
    caller = None
    if args.snpfile or args.wigfile:
        caller = snp.SnpCaller(idx.genome, snp.SnpOptions(
            min_snp_reads=args.minsnpreads, qvalue=args.qvalue))

    def stream(paths):
        for path in paths:
            yield from read_seqs(path)

    if args.pairfile:  # paired-end mode (-U/-u/-d/-D)
        from .align import pe
        pal = pe.PeAligner(al, pair_min_len=args.pairminlen,
                           pair_max_len=args.pairmaxlen,
                           pe_mode=args.pemode or 2)
        with t.phase("align"):
            stats = pal.write_sam(
                args.outfile,
                pal.align_pairs(list(stream(args.infile)),
                                list(stream(args.pairfile))),
                cmdline=" ".join(sys.argv),
                emit_unmapped=(args.format == 1), snp_caller=caller)
        log.info("kalign PE: %s", stats)
    else:
        with t.phase("align"):
            stats = kalign.write_sam(
                args.outfile, idx, al.align_records(stream(args.infile)),
                cmdline=" ".join(sys.argv),
                emit_unmapped=(args.format == 1), snp_caller=caller)
        log.info("kalign: %d reads, %s", sum(stats.values()), stats)
    if caller is not None:
        with t.phase("snp call"):
            calls = caller.call()
        if args.snpfile:
            if args.snpfile.endswith(".vcf"):
                snp.write_snps_vcf(args.snpfile, calls)
            else:
                snp.write_snps_csv(args.snpfile, calls)
            log.info("snps: %d accepted -> %s", len(calls), args.snpfile)
        if args.wigfile:
            write_wig(args.wigfile, idx.genome, caller.coverage())
    log.info("phases: %s", json.dumps(t.phases))
    return 0


def cmd_hammings(args) -> int:
    """ngskit4b hammings equivalent (hammings.cpp)."""
    from .io.fasta import Genome
    from .kmer import hammings
    from .utils.runtime import PhaseTimer, enable_compile_cache, log
    enable_compile_cache()
    t = PhaseTimer()
    with t.phase("load genome"):
        g = Genome.load(args.infile)
    with t.phase("sweep"):
        hd = hammings.hammings_exhaustive(
            g.seq, args.kmerlen, antisense=not args.watsononly,
            node=args.node - 1, numnodes=args.numnodes)
    with t.phase("write"):
        if args.outfile.endswith(".csv"):
            hammings.write_csv(args.outfile, g, hd, args.kmerlen)
        else:
            np.save(args.outfile, hd)
    log.info("hammings: K=%d node %d/%d -> %s (phases %s)",
             args.kmerlen, args.node, args.numnodes, args.outfile,
             json.dumps(t.phases))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="kit4b_tpu", fromfile_prefix_chars="@",
        description="TPU-native sequence analysis toolkit "
                    "(kit4b-compatible subcommands)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index", help="generate suffix index over genome")
    p.add_argument("-i", "--in", dest="infile", nargs="+", required=True)
    p.add_argument("-o", "--out", dest="outfile", required=True)
    p.add_argument("-r", "--ref", dest="refname", default="ref")
    p.add_argument("-T", "--threads", type=int, default=0)
    _common(p)
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("simreads", help="generate simulated readsets")
    p.add_argument("-i", "--in", dest="infile", required=True)
    p.add_argument("-o", "--out", dest="outfile", required=True)
    p.add_argument("-O", "--outpe", dest="outpe", default=None)
    p.add_argument("-n", "--nreads", type=int, default=10000)
    p.add_argument("-l", "--length", type=int, default=100)
    p.add_argument("-p", "--pe", dest="pe", action="store_const", const=True,
                   default=None, help="generate paired ends")
    p.add_argument("-j", "--insertmin", type=int, default=200)
    p.add_argument("-J", "--insertmax", type=int, default=500)
    p.add_argument("-e", "--errmode", default="none",
                   choices=["none", "uniform", "illumina"])
    p.add_argument("-z", "--subsrate", type=float, default=0.01)
    p.add_argument("-s", "--strand", default="both", choices=["both", "+"])
    p.add_argument("-q", "--fastq", action="store_true")
    p.add_argument("-S", "--seed", type=int, default=1)
    _common(p)
    p.set_defaults(fn=cmd_simreads)

    p = sub.add_parser("kalign", help="align reads to indexed genome")
    p.add_argument("-i", "--in", dest="infile", nargs="+", required=True)
    p.add_argument("-I", "--sfx", dest="sfxfile", required=True)
    p.add_argument("-o", "--out", dest="outfile", required=True)
    p.add_argument("-m", "--mode", type=int, default=0,
                   help="0 std, 1 more sensitive, 2 ultra, 3 less")
    p.add_argument("-M", "--format", type=int, default=0,
                   help="0 SAM accepted only, 1 SAM all reads")
    p.add_argument("-s", "--substitutions", type=int, default=5)
    p.add_argument("-r", "--editdelta", type=int, default=1)
    p.add_argument("-R", "--maxmulti", type=int, default=5)
    p.add_argument("-n", "--maxns", type=int, default=1)
    p.add_argument("-S", "--snp", dest="snpfile", default=None,
                   help="SNP output (.csv or .vcf)")
    p.add_argument("-g", "--wig", dest="wigfile", default=None,
                   help="coverage WIG output")
    p.add_argument("-p", "--minsnpreads", type=int, default=5)
    p.add_argument("-P", "--qvalue", type=float, default=0.05)
    p.add_argument("-b", "--batchsize", type=int, default=8192)
    p.add_argument("-T", "--threads", type=int, default=0)
    p.add_argument("-u", "--pair", dest="pairfile", nargs="+", default=None,
                   help="PE mate-2 input files")
    p.add_argument("-U", "--pemode", type=int, default=0,
                   help="0 none, 1 PE w/ orphan recovery, 2 PE no recovery, "
                        "3/4 as 1/2 but orphans processed as SE")
    p.add_argument("-d", "--pairminlen", type=int, default=100)
    p.add_argument("-D", "--pairmaxlen", type=int, default=1000)
    _common(p)
    p.set_defaults(fn=cmd_kalign)

    p = sub.add_parser("hammings", help="genome-wide K-mer Hamming distances")
    p.add_argument("-i", "--in", dest="infile", required=True)
    p.add_argument("-o", "--out", dest="outfile", required=True)
    p.add_argument("-K", "--kmerlen", type=int, default=25)
    p.add_argument("-N", "--node", type=int, default=1)
    p.add_argument("-n", "--numnodes", type=int, default=1)
    p.add_argument("-w", "--watsononly", action="store_true")
    _common(p)
    p.set_defaults(fn=cmd_hammings)

    return ap


def main(argv=None) -> int:
    from .utils.runtime import setup_logging
    args = build_parser().parse_args(argv)
    setup_logging(getattr(args, "loglevel", "info"),
                  getattr(args, "logfile", None))
    t0 = time.time()
    rc = args.fn(args)
    print(f"kit4b_tpu {args.cmd}: done in {time.time() - t0:.1f}s",
          file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
