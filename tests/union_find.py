"""Shared sequential union-find oracle for the connected-components
family (batch CC, streaming cluster maintenance, streaming near-dup
clustering).  One copy so every parity suite pins the SAME invariant:
component id = min node id, union-by-min with path compression."""


def brute(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}
