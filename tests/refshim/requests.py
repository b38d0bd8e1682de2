def get(*a, **k):
    raise RuntimeError("network disabled in differential tests")
