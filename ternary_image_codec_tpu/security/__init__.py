from . import policy, route  # noqa: F401
