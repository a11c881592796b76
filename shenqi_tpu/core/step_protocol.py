"""The one KDK step protocol, shared by both run loops.

The reference has exactly ONE main loop (libgadget/run.cpp:331-822)
and both of our drivers — the single-device `Simulation` and the
distributed `SlabSimulation` — must follow its stage order exactly:

    drift -> HCI query -> forces -> first half-kick ->
    FIRST kick-time advance (run.cpp:578) -> PM half-kick ->
    PM-cadence physics -> Strang sources -> outputs ->
    find-timesteps -> second half-kick ->
    SECOND kick-time advance (run.cpp:809) -> PM half-kick

Round 4's star-small fireball was a protocol-order bug (the second
kick-time advance missing) that had to be found once and fixed TWICE
because each loop carried its own copy of this sequence.  This module
makes the ordering single-sited: `run_protocol` owns the sequence and
the kick-time bookkeeping; the simulations provide the stage
implementations through a small adapter vocabulary:

    proto_drift(ti_next)        drift everyone to ti_next
    proto_forces(is_pm, first)  domain/rebalance + PM + tree + SPH +
                                hierarchical closing kicks, in the
                                loop's own order (run.cpp:426-505)
    proto_sources(is_pm, first) Strang-split subgrid sources
                                (cooling/SFR/winds/BH/metal return,
                                run.cpp:604-681)
    proto_snapshot(atime)       write a planned sync-point snapshot
                                (slots_gc first where applicable,
                                run.cpp:704)
    proto_pre_timestep()        diagnostics before find-timesteps
    proto_bad_timestep(n)       emergency dump + endrun
                                (run.cpp:794-797)

plus the shared attributes both classes already expose: `times`,
`timeline`, `hci`, `step_count`, `resumed`, `hierarchical`,
`snapshots`, `on_pm_step`, `on_step`, `on_snapshot`, `on_checkpoint`,
`_wt`, `_apply_half_kick`, `_apply_pm_half_kick`,
`_find_timesteps`, `_hier_first_half`.
"""

from __future__ import annotations

from .integrate import find_next_kick, update_kick_times


def run_protocol(s, max_steps: int = 10 ** 9):
    """Evolve `s` until the last sync point (or max_steps)."""
    from ..utils import hci as hcimod
    first = s.step_count == 0
    while max_steps > 0:
        max_steps -= 1
        times = s.times
        s._wt("Misc")
        if not first:
            ti_next = find_next_kick(times.ti_current,
                                     times.mintimebin)
            ti_next = min(ti_next, times.pm_start + times.pm_length)
            s.proto_drift(ti_next)
            s._wt("Drift")
        is_pm = times.is_pm()

        hci_action = 0
        if is_pm and s.hci is not None:
            # query HCI requests only on PM steps, where kicks and
            # drifts are synced (run.cpp:406-413); host-side so every
            # device sees the same verdict (hci.cpp rank-0 broadcast)
            hci_action = s.hci.query()
            if hci_action == hcimod.HCI_TERMINATE:
                # human-triggered termination: no checkpoint
                s.hci_exit = "terminate"
                break

        # forces: domain maintenance + PM + tree + SPH, in the
        # loop's own order (run.cpp:426-505)
        s.proto_forces(is_pm, first)

        if not first:
            s._apply_half_kick(skip_grav=s.hierarchical)
        # FIRST kick-time advance (run.cpp:578): each active bin
        # advances dti/2 per half-kick
        update_kick_times(times)
        if is_pm and not first:
            s._apply_pm_half_kick()

        # FOF-cadence physics on PM steps: BH seeding searches,
        # HeIII bubbles, excursion UVBG (run.cpp:637-660)
        if is_pm and not first and s.on_pm_step is not None:
            s.on_pm_step(s)

        # Strang-split source terms after the kick (run.cpp:604-681)
        s.proto_sources(is_pm, first)

        # sync-point outputs (run.cpp:688-712)
        sp = s.timeline.find_current_sync_point(times.ti_current)
        planned = (sp is not None and sp.write_snapshot
                   and not (first and s.resumed))
        if planned:
            s.proto_snapshot(s.atime())
            s.snapshots.append(s.atime())
            s._wt("Snapshot")

        # HCI-requested checkpoint/stop (run.cpp:700-761): an
        # unplanned dump unless this step just wrote a planned one
        if hci_action:
            if hcimod.wants_checkpoint(hci_action) and not planned:
                cb = s.on_checkpoint or s.on_snapshot
                if cb:
                    s.proto_checkpoint(cb, s.atime())
                s.snapshots.append(s.atime())
                s._wt("Snapshot")
            if hcimod.wants_break(hci_action):
                s.hci_exit = {
                    hcimod.HCI_STOP: "stop",
                    hcimod.HCI_TIMEOUT: "timeout",
                }.get(hci_action, "terminate")
                break

        if s.timeline.find_next_sync_point(times.ti_current) is None:
            break

        s.proto_pre_timestep()
        if s.hierarchical:
            bad = s._hier_first_half(first_step=first)
        else:
            bad = s._find_timesteps(first_step=first)
        s._wt("Timeline")
        if bad:
            s.proto_bad_timestep(bad)
        s._apply_half_kick(skip_grav=s.hierarchical)
        # SECOND kick-time advance (run.cpp:809).  With only the
        # first advance, Ti_kick lags ti_current by half the ELAPSED
        # time, the predictor intervals [Ti_kick, ti] grow without
        # bound and EntVarPred/VelPred explode — the star-small
        # a=0.111 entropy fireball (three rounds of symptom-chasing,
        # one missing line).
        update_kick_times(times)
        if is_pm:
            s._apply_pm_half_kick()
        s.step_count += 1
        first = False
        if s.on_step:
            s.on_step(s)
    return s
