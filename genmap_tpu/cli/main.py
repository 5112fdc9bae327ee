"""genmap-tpu command line: `index` and `map` subcommands.

Flag surface mirrors the reference CLI
(/root/reference/src/indexing.hpp:277-345, mappability.hpp:409-545).
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
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
