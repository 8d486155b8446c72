from . import trits, gf27, rs  # noqa: F401
