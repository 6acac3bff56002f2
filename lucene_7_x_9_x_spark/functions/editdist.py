"""Edit distances for fuzzy term expansion (FuzzyQuery.java:35,85).

Shared by the driver-side Spark expansion (searcher) and the pure-pandas
oracle engine so both expand a FuzzyQuery to the identical term set.
"""

from __future__ import annotations


def osa_distance(a: str, b: str) -> int:
    """Optimal-string-alignment (restricted Damerau-Levenshtein) distance:
    insert / delete / substitute / adjacent-transposition each cost 1 — the
    reference's transpositions=true edit model
    (solr-8.4.0/.../util/automaton/LevenshteinAutomata.java:46-52)."""
    la, lb = len(a), len(b)
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[lb]


def levenshtein_le(a: str, b: str, k: int) -> bool:
    """Plain Levenshtein distance <= k with early exit (the
    transpositions=false model)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        if min(cur) > k:
            return False
        prev = cur
    return prev[-1] <= k
