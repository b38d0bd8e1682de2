def tqdm(iterable=None, *a, **k):
    return iterable
