"""Command-line entry point, mirroring the reference's main.C dispatch
(src/main.C:17-57):

  python -m rdcfes_tpu.cli -m {adpm|pihna|proteas|ripf} [input=<file>]
  python -m rdcfes_tpu.cli -s
  python -m rdcfes_tpu.cli -c hcc
  python -m rdcfes_tpu.cli -u process_mesh

Only PROTEAS consumes `input=<file>` (as in the reference); all other
drivers read `input.dat` from the working directory.
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    input_file = "input.dat"
    for a in argv:
        if a.startswith("input="):
            input_file = a.split("=", 1)[1]
    print(f"\n ** Input file is: {input_file}\n"
          "    Use 'input=<file>' to specify a different input file.\n")

    def next_after(flag):
        i = argv.index(flag)
        return argv[i + 1] if i + 1 < len(argv) else ""

    from . import drivers

    if "-m" in argv:
        model = next_after("-m")
        if model == "adpm":
            drivers.adpm.run()
        elif model == "pihna":
            drivers.pihna.run()
        elif model == "proteas":
            drivers.proteas.run(input_file)
        elif model == "ripf":
            drivers.ripf.run()
        else:
            return 1
    elif "-s" in argv:
        drivers.solid.run()
    elif "-c" in argv:
        if next_after("-c") == "hcc":
            drivers.coupled_hcc.run()
        else:
            return 1
    elif "-u" in argv:
        if next_after("-u") == "process_mesh":
            drivers.process_mesh.run()
        else:
            return 1
    else:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
