"""One-frame-in-flight dispatch/consume pipelining.

Through the remote-TPU tunnel, fetching a frame right after dispatching it
serializes host work (PNG/mp4 encode) with device work. Keeping exactly one
frame in flight — dispatch k+1, then consume k — overlaps the two without
holding more than two frames of device memory.
"""


def pipelined(items, dispatch, consume):
    """For each item: `out = dispatch(item)` (async device work), then
    `consume(prev_out)` for the previous item; drains the last one."""
    pending = None
    for it in items:
        out = dispatch(it)
        if pending is not None:
            consume(pending)
        pending = out
    if pending is not None:
        consume(pending)
