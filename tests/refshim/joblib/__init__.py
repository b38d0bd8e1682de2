"""Sequential stand-in for joblib.Parallel/delayed."""
class Parallel:
    def __init__(self, *a, **k): pass
    def __call__(self, tasks):
        return [fn(*args, **kwargs) for fn, args, kwargs in tasks]
def delayed(fn):
    def wrap(*a, **k):
        return (fn, a, k)
    return wrap
