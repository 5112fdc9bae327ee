"""genmap-tpu command line: `index` and `map` subcommands.

Flag surface mirrors the reference CLI
(/root/reference/src/indexing.hpp:277-345, mappability.hpp:409-545).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    from genmap_tpu.hostmem import retain_heap

    retain_heap()
    from genmap_tpu.parallel.dist import maybe_initialize

    maybe_initialize()
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "--version":
        from genmap_tpu import __version__

        print(f"genmap-tpu {__version__} — TPU-native (k,e)-mappability\n"
              "Capability-equivalent to GenMap (Pockrandt et al., "
              "Bioinformatics 2020, doi:10.1093/bioinformatics/btaa222), "
              "re-designed from scratch for TPU hardware.")
        return 0
    if not argv or argv[0] in ("-h", "--help"):
        print(
            "genmap-tpu — TPU-native (k,e)-mappability\n"
            "Usage: genmap-tpu index|map [options]\n"
            "  index  build the bidirectional FM-index of fasta file(s)\n"
            "  map    compute mappability/frequency from an index"
        )
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "index":
        from genmap_tpu.cli.index_cmd import index_main

        return index_main(rest)
    if cmd == "map":
        from genmap_tpu.cli.map_cmd import map_main

        return map_main(rest)
    print(f"ERROR: unknown command '{cmd}' (expected 'index' or 'map')", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
