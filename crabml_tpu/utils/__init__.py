

def bucket(n: int, minimum: int = 8) -> int:
    """Smallest power-of-two >= n (>= minimum) — the shared padding/window
    bucketing policy; it bounds how many shapes ever get compiled."""
    b = minimum
    while b < n:
        b *= 2
    return b
