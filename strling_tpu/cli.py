"""strling_tpu command-line interface.

Mirrors the reference dispatcher (src/strling.nim:12-44): the same subcommands
with the same flags, defaults and output files.

  extract      extract informative STR reads from a BAM. Required first step.
  merge        merge putative STR loci from multiple samples (joint calling).
  call         call STRs.
  index        identify large STRs in the reference genome -> <fasta>.str
  pull_region  debugging; pull all reads (and mates) for a region.
  outliers     cohort-level outlier statistics (the reference's
               scripts/strling-outliers.py).
  simulate     simulate reads with STR expansions (simulate_reads.nim).
"""

from __future__ import annotations

import argparse
import sys

from strling_tpu.version import __version__


def _extract(argv):
    p = argparse.ArgumentParser("strling extract")
    p.add_argument("-f", "--fasta", default="", help="path to fasta file (required for CRAM)")
    p.add_argument("-g", "--genome-repeats", default="", help="optional path to genome repeats file. if it does not exist, it will be created")
    p.add_argument("-p", "--proportion-repeat", type=float, default=0.8, help="proportion of read that is repetitive to be considered as STR")
    p.add_argument("-q", "--min-mapq", type=int, default=40, help="minimum mapping quality (does not apply to STR reads)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--profile", default="", help="write a jax.profiler trace of the scan to this directory")
    p.add_argument("--devices", default="", help="'all' or a count: round-robin scan batches over local chips (output is byte-identical)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: shard chromosomes over jax.distributed processes; process 0 writes the bin")
    p.add_argument("bam", help="path to bam file")
    p.add_argument("bin", help="path to output bin file to be created")
    args = p.parse_args(argv)

    from strling_tpu.core.extract import extract_native
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.binfmt import write_bin

    from strling_tpu.utils.profiling import maybe_trace

    if args.distributed:
        from strling_tpu.parallel.extract_dist import run_extract_dist

        run_extract_dist(
            args.bam, args.fasta or None, args.genome_repeats or None,
            proportion_repeat=args.proportion_repeat, min_mapq=args.min_mapq,
            output_bin=args.bin, verbose=args.verbose,
        )
        print("[strling] finished extraction", file=sys.stderr)
        return

    bam = Bam(args.bam, fasta=args.fasta or None)
    with maybe_trace(args.profile or None, "extract"):
        treads, frag_dist, opts = extract_native(
            bam, args.fasta or None, args.genome_repeats or None,
            proportion_repeat=args.proportion_repeat, min_mapq=args.min_mapq,
            verbose=args.verbose, devices=args.devices or None,
        )
    print(f"[strling] writing binary file:{args.bin}", file=sys.stderr)
    write_bin(args.bin, treads, frag_dist, bam.header_text,
              args.proportion_repeat, args.min_mapq)
    print("[strling] finished extraction", file=sys.stderr)


def _index(argv):
    p = argparse.ArgumentParser("strling index")
    p.add_argument("-g", "--genome-repeats", default="", help="optional path to output genome repeats file (default: ./<FASTA>.str)")
    p.add_argument("-p", "--proportion-repeat", type=float, default=0.8)
    p.add_argument("fasta", help="path to fasta file")
    args = p.parse_args(argv)

    import os

    from strling_tpu.core.genome_index import genome_repeats
    from strling_tpu.utils.options import Options

    out = args.genome_repeats or (os.path.basename(args.fasta) + ".str")
    print(f"Writing genome str index to: {out}", file=sys.stderr)
    genome_repeats(args.fasta, Options(proportion_repeat=args.proportion_repeat), out)


def _call(argv):
    from strling_tpu.core.call import call_main

    call_main(argv)


def _merge(argv):
    from strling_tpu.core.merge import merge_main

    merge_main(argv)


def _outliers(argv):
    from strling_tpu.core.outliers import outliers_main

    outliers_main(argv)


def _pull_region(argv):
    from strling_tpu.core.pull_region import pull_region_main

    pull_region_main(argv)


def _simulate(argv):
    from strling_tpu.core.simulate import simulate_main

    simulate_main(argv)


COMMANDS = {
    "extract": (_extract, "extract informative STR reads from a BAM/CRAM. This is a required first step."),
    "merge": (_merge, "merge putative STR loci from multiple samples. Only required for joint calling."),
    "call": (_call, "call STRs"),
    "index": (_index, "identify large STRs in the reference genome, to produce ref.fasta.str."),
    "pull_region": (_pull_region, "for debugging; pull all reads (and mates) for a given region"),
    "outliers": (_outliers, "cohort-level outlier statistics across many samples"),
    "simulate": (_simulate, "simulate paired reads with STR expansions"),
}


def _enable_compile_cache():
    """Remote TPU compiles are slow and variable; cache them persistently."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if "--platform" in argv:
        # global escape hatch: force a jax backend (e.g. cpu) before first
        # device use — env vars cannot override a sitecustomize platform pin
        i = argv.index("--platform")
        plat = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
        import jax

        jax.config.update("jax_platforms", plat)
    _enable_compile_cache()
    print(f"\nstrling version: {__version__} (strling_tpu)", file=sys.stderr)
    if not argv or argv[0] not in COMMANDS:
        print("\nCommands: ", file=sys.stderr)
        for k, (_, desc) in COMMANDS.items():
            print(f"  {k:<13}:   {desc}")
        if argv and argv[0] in ("-h", "--help"):
            return 0
        if argv:
            print(f"unknown program '{argv[0]}'")
        raise SystemExit("ERROR: please enter a valid command")
    COMMANDS[argv[0]][0](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
