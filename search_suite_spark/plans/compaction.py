"""LSM compaction policy: Fibonacci-hybrid pair picking.

Pure-Python (driver-side) replica of the reference's segment-pair
chooser (/root/reference/searchapi3/src/CompactorStrategy.hs:13-81),
invoked after every ingest (Indexer.hs:104) until no pair remains
(Compactor.hs:57-97). The policy's intent — property-tested in the
reference (searchapi3/test/Tests.hs:110-138, `willReturnToFib`) — is
that repeated compaction converges every segment size to a Fibonacci
number, giving LSM-style logarithmic segment counts.

Segments here are identified by opaque keys with a doc count; the
registry maps the chosen keys back to segment directories.
"""

from __future__ import annotations

from bisect import bisect_right

_FIBS: list[int] = []
_a, _b = 0, 1
while len(_FIBS) < 100:
    _FIBS.append(_b)
    _a, _b = _b, _a + _b
FIB_SET = frozenset(_FIBS)


def is_fib(n: int) -> bool:
    return n in FIB_SET


def next_fib_above(n: int) -> int:
    """Smallest Fibonacci number strictly greater than n."""
    i = bisect_right(_FIBS, n)
    if i >= len(_FIBS):
        raise OverflowError("out of Fibonacci numbers")
    return _FIBS[i]


def _adjacent_pairs(items: list) -> list[tuple]:
    return list(zip(items, items[1:]))


def choose_merge_pair(sizes: dict[object, int]) -> tuple[object, object] | None:
    """Pick two segments to merge, or None if compacted.

    Mirrors hybridStrategy (CompactorStrategy.hs:19-27):
      - all sizes Fibonacci → merge the adjacent (size-sorted) pair with
        the largest Fibonacci sum, if any ("largestFibonacciStrategy");
      - else take the largest non-Fibonacci segment, gap = next Fibonacci
        above it minus its size; a segment of exactly gap size fills it
        ("gap 1"); otherwise the adjacent pair among the others with the
        largest sum <= gap ("incrementalGapFill"); otherwise None.
    """
    if len(sizes) < 2:
        return None
    ordered = sorted(sizes, key=lambda k: (sizes[k], str(k)))
    non_fib = [k for k in ordered if not is_fib(sizes[k])]

    if not non_fib:
        best = None
        for a, b in _adjacent_pairs(ordered):
            s = sizes[a] + sizes[b]
            if is_fib(s) and (best is None or s > best[0]):
                best = (s, a, b)
        return (best[1], best[2]) if best else None

    target = non_fib[-1]
    gap = next_fib_above(sizes[target]) - sizes[target]
    others = [k for k in ordered if k != target]
    for k in others:
        if sizes[k] == gap:
            return (k, target)
    best = None
    for a, b in _adjacent_pairs(others):
        s = sizes[a] + sizes[b]
        if s <= gap and (best is None or s > best[0]):
            best = (s, a, b)
    return (best[1], best[2]) if best else None


def compaction_schedule(sizes: dict[object, int]) -> list[tuple[object, object, object]]:
    """Dry-run the policy to a fixpoint; returns [(a, b, merged_key)].

    Used by tests (the `willReturnToFib` property) and by the registry's
    compact loop to plan merges without touching storage.
    """
    sizes = dict(sizes)
    plan = []
    gen = 0
    pair = choose_merge_pair(sizes)
    while pair is not None:
        a, b = pair
        merged_key = f"merged_{gen}"
        gen += 1
        sizes[merged_key] = sizes.pop(a) + sizes.pop(b)
        plan.append((a, b, merged_key))
        pair = choose_merge_pair(sizes)
    return plan
