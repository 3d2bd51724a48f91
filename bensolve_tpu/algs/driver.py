"""End-to-end solve driver (placeholder; filled in with the algorithm layer)."""


def solve(*args, **kwargs):
    raise NotImplementedError("algorithm layer under construction")
