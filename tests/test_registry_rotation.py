"""Driver-window scheduling: ordered_registry() decides WHICH ~50 queries
the driver's one correctness pass re-verifies each round, so its ordering
rules are behavior worth pinning:

1. priority sentinels without a green row lead;
2. force-recheck entries whose last green row predates their change round
   come next (and drop out once re-greened);
3. never-verified queries precede verified ones;
4. the green tail is STALEST-FIRST (oldest green round re-verified first).
"""

from __future__ import annotations

from streamprocessors_spark import plans

plans.load_all()


def _ordered_with(monkeypatch, green_rounds):
    monkeypatch.setattr(plans, "_driver_green_rounds", lambda: dict(green_rounds))
    return list(plans.ordered_registry())


def test_force_recheck_expires_once_regreened(monkeypatch):
    names = list(plans.REGISTRY)
    # everything green in round 4 -> every pin with since <= 4 is expired,
    # so the order collapses to the plain stalest-first tail: all rounds
    # equal -> registration order, no pin jumps the queue
    order = _ordered_with(monkeypatch, {n: 4 for n in names})
    expired = [n for n in names if plans._FORCE_RECHECK.get(n, 0) <= 4]
    assert [n for n in order if n in set(expired)] == expired


def test_force_recheck_pins_lead_when_stale(monkeypatch):
    names = list(plans.REGISTRY)
    # everything last green in round 1 -> all force-recheck pins active
    order = _ordered_with(monkeypatch, {n: 1 for n in names})
    active = [
        n
        for n, since in plans._FORCE_RECHECK.items()
        if n in plans.REGISTRY and since > 1
    ]
    assert order[: len(active)] == [n for n in plans._FORCE_RECHECK if n in active]


def test_unverified_precede_green(monkeypatch):
    names = list(plans.REGISTRY)
    green = {n: 4 for n in names[: len(names) // 2]}
    order = _ordered_with(monkeypatch, green)
    pos = {n: i for i, n in enumerate(order)}
    # _DEFER_PAST_GREEN names are the documented exception to this rule
    worst_unverified = max(
        pos[n]
        for n in names
        if n not in green and n not in plans._DEFER_PAST_GREEN
    )
    # the force-recheck pins are the only green rows allowed ahead
    allowed_ahead = {n for n, since in plans._FORCE_RECHECK.items() if since > 4}
    best_plain_green = min(
        pos[n] for n in green if n not in allowed_ahead
    )
    assert worst_unverified < best_plain_green


def test_green_tail_is_stalest_first(monkeypatch):
    names = list(plans.REGISTRY)
    # alternate green rounds 1..3 across all queries; no unverified
    green = {n: (i % 3) + 1 for i, n in enumerate(names)}
    # neutralize force-recheck pins for this case: all pins re-greened
    for n in plans._FORCE_RECHECK:
        if n in green:
            green[n] = 9
    order = _ordered_with(monkeypatch, green)
    rounds_in_order = [green[n] for n in order]
    assert rounds_in_order == sorted(rounds_in_order)


def test_every_query_present_exactly_once(monkeypatch):
    order = _ordered_with(monkeypatch, {})
    assert sorted(order) == sorted(plans.REGISTRY)
    order2 = _ordered_with(monkeypatch, {n: 2 for n in plans.REGISTRY})
    assert sorted(order2) == sorted(plans.REGISTRY)


def test_deferred_unverified_sort_last_until_green(monkeypatch):
    names = list(plans.REGISTRY)
    victim = names[-1]
    monkeypatch.setattr(
        plans, "_DEFER_PAST_GREEN", frozenset({victim})
    )
    # unverified + deferred -> dead last, behind every green row
    green = {n: 3 for n in names if n != victim}
    order = _ordered_with(monkeypatch, green)
    assert order[-1] == victim
    assert sorted(order) == sorted(names)
    # a green row expires the deferral: back to plain stalest-first
    order2 = _ordered_with(monkeypatch, {**green, victim: 1})
    pins = {
        n for n, since in plans._FORCE_RECHECK.items() if since > 1
    }
    head = [n for n in order2 if n not in pins]
    assert head[0] == victim  # round 1 is the stalest green
