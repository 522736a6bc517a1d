"""Test-only immutabledict stand-in."""


class immutabledict(dict):
    """Read-mostly mapping; mutation raises like the real package."""

    def _no(self, *a, **k):
        raise TypeError('immutabledict is immutable')

    __setitem__ = __delitem__ = _no
    update = pop = popitem = clear = setdefault = _no
