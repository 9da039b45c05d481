from .. import __version__


def version(par, cmd):
    print(__version__)
    return 0
