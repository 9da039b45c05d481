"""CLI shell: dispatch, categorized usage, did-you-mean.

Reference: src/mmseqs.cpp, src/commons/Application.cpp:24-237.
"""

import sys
from collections import OrderedDict

from . import __version__
from .params import Params
from .registry import COMMANDS, get_command, suggest, CAT_HIDDEN
from .utils import log


def print_usage():
    out = [f"mmseqs2-tpu — TPU-native sequence search & clustering "
           f"(version {__version__})\n"]
    cats = OrderedDict()
    for c in COMMANDS:
        if c.category == CAT_HIDDEN:
            continue
        cats.setdefault(c.category, []).append(c)
    for cat, cmds in cats.items():
        out.append(f"\n{cat}:")
        for c in cmds:
            out.append(f"  {c.name:<22} {c.description}")
    out.append("\nUse `mmseqs2-tpu <command> --help` for command usage.\n")
    print("\n".join(out))


def _enable_jax_compile_cache():
    from .utils.jaxcache import enable_jax_compile_cache
    enable_jax_compile_cache()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print_usage()
        return 0
    name = argv[0]
    cmd = get_command(name)
    if cmd is None:
        s = suggest(name)
        hint = f"\nDid you mean \"{s}\"?" if s else ""
        log.error(f"Invalid command {name}.{hint}")
        return 1
    if "--help" in argv or "-h" in argv:
        print(f"Usage: mmseqs2-tpu {cmd.usage}\n\n{cmd.description}")
        return 0
    timer = log.Timer()
    _enable_jax_compile_cache()
    # join the multi-host cluster before any command touches devices
    # (no-op unless MMSEQS_COORDINATOR is set; parallel/multihost.py)
    from .parallel.multihost import init_multihost
    init_multihost()
    par = Params().parse(argv[1:], cmd, cmd.min_db, cmd.max_db)
    fn = cmd.load()
    ret = fn(par, cmd)
    log.info(f"Time for processing: {timer}")
    return ret or 0


if __name__ == "__main__":
    sys.exit(main())
