"""`genmap-tpu index` — build and persist the bidirectional FM-index.

Mirrors /root/reference/src/indexing.hpp:277-510 (argument surface, directory
scanning, duplicate-name check, Dna4 auto-detection happens inside build).
"""

from __future__ import annotations

import argparse
import os
import sys

from genmap_tpu.index.build import build_index
from genmap_tpu.io.fasta import FASTA_FILE_TYPES, find_fasta_files, read_fasta


def index_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="genmap-tpu index", add_help=True)
    p.add_argument("-F", "--fasta-file")
    p.add_argument("-FD", "--fasta-directory")
    p.add_argument("-I", "--index", required=True)
    p.add_argument("-A", "--algorithm", default="divsufsort",
                   choices=["divsufsort", "skew"])  # accepted for compat; one path here
    p.add_argument("-S", "--sampling", type=int, default=10)
    p.add_argument("-v", "--verbose", action="store_true")
    # reference width-override expert flags (indexing.hpp:319-327); our index
    # arrays are self-describing, so these are accepted for CLI compatibility
    p.add_argument("-xa", "--seqno", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("-xb", "--seqpos", type=int, default=None, help=argparse.SUPPRESS)
    p.add_argument("-xc", "--bwtlen", type=int, default=None, help=argparse.SUPPRESS)
    # expert: cap part sizes so the dimer fast path survives >2^31-symbol
    # genomes (more parts = more per-batch work; see index/build.py)
    p.add_argument("-xd", "--dimer-parts", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("-T", "--threads", type=int, default=1,
                   help="parallel part-construction workers")
    args = p.parse_args(argv)

    if not (1 <= args.sampling <= 64):
        print("ERROR: sampling rate must be in [1, 64].", file=sys.stderr)
        return 1
    if args.fasta_file and args.fasta_directory:
        print("ERROR: You can only use eiher --fasta-file or --fasta-directory, not both.",
              file=sys.stderr)
        return 1
    if not args.fasta_file and not args.fasta_directory:
        print("ERROR: You forgot to specify --fasta-file or --fasta-directory.",
              file=sys.stderr)
        return 1

    if os.path.exists(args.index):
        print(f"ERROR: The directory for the index already exists at {args.index}\n"
              "       Please remove it, or choose a different location.", file=sys.stderr)
        return 1

    fasta_files = []
    if args.fasta_directory:
        if not os.path.isdir(args.fasta_directory):
            print("ERROR: The fasta directory does not exist!", file=sys.stderr)
            return 1
        found = find_fasta_files(args.fasta_directory)
        names = [fn for _p, fn in found]
        for a, b in zip(names, names[1:]):
            if a == b:
                print("ERROR: At least two fasta files with the same filename found "
                      "(this is not supported)! Please rename them and run again.",
                      file=sys.stderr)
                return 1
        for path, fn in found:
            ff = read_fasta(path + fn, name=fn)
            if ff.seqs:
                fasta_files.append(ff)
        if not fasta_files:
            print("ERROR: No (non-empty) fasta file found!", file=sys.stderr)
            return 1
        print(f"{len(found)} fasta files have been loaded"
              " (run with --verbose to list the files):")
        if args.verbose:
            for path, fn in found:
                print(path + fn)
    else:
        if not os.path.isfile(args.fasta_file):
            print("ERROR: The fasta file does not exist!", file=sys.stderr)
            return 1
        ext = args.fasta_file.rsplit(".", 1)[-1]
        if ext not in FASTA_FILE_TYPES:
            print(f"ERROR: unsupported fasta extension .{ext}", file=sys.stderr)
            return 1
        ff = read_fasta(args.fasta_file)
        if ff.seqs:
            fasta_files.append(ff)

    if not fasta_files:
        print("ERROR: There is no non-empty sequence in the fasta file(s).", file=sys.stderr)
        return 1

    data = build_index(fasta_files, sampling=args.sampling,
                       directory=bool(args.fasta_directory),
                       dimer_parts=args.dimer_parts,
                       workers=max(1, args.threads))
    if args.verbose:
        print(f"Index will be constructed using "
              f"{'dna5/rna5' if data.has_n else 'dna4/rna4'} alphabet.")
    data.save(args.index)
    print("Index created successfully.")
    return 0
