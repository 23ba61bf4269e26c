"""``job.schedule`` — the reference's most common ``.pull`` key.

The reference schedules jobs through an embedded Quartz scheduler
(gobblin-runtime ``scheduler/JobScheduler.java`` — the trigger is built
from ``job.schedule`` at :399, ``ConfigurationKeys.JOB_SCHEDULE_KEY =
"job.schedule"``; a job WITHOUT the key is a one-time job
(:518 sets ``job.runonce=true``), and ``job.disabled=true`` skips
scheduling entirely (:366-370)).

This engine is a LIBRARY on a shared Spark cluster: the long-running
scheduler loop belongs to the deployment's orchestrator (Airflow, cron,
Dagster, a Quartz host) — re-implementing a resident daemon inside a
Spark driver would fight the cluster manager over the driver's
lifetime. The delegation contract is therefore:

1. the spec compiler ACCEPTS ``job.schedule`` (never rejects a
   reference ``.pull`` file) and parses it as a Quartz cron;
2. :class:`QuartzCron` exposes ``next_fire_time`` / ``matches`` so the
   host scheduler (or an operator's sensor) can compute trigger times
   from the job's own spec — the same answer Quartz's
   ``trigger.getNextFireTime()`` logs at JobScheduler.java:400;
3. ``run_job`` executes exactly ONE trigger occurrence; the caller
   loops.

Quartz cron (6-7 fields: sec min hour day-of-month month day-of-week
[year]) differs from POSIX cron: it has a seconds field, day-of-week is
1-7 starting at SUN=1, and exactly one of dom/dow should be ``?``
(no-specific-value). Supported subset: ``*``, ``?``, lists, ranges,
steps, and names (JAN-DEC, SUN-SAT) — the forms that appear in the
reference's shipped configs (e.g. gobblin-example's
``job.schedule=0 0/2 * * * ?``). Calendar-position forms (``L``,
``W``, ``#``) raise loudly rather than misfire silently."""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_MONTHS = {m: i + 1 for i, m in enumerate(
    "JAN FEB MAR APR MAY JUN JUL AUG SEP OCT NOV DEC".split()
)}
# Quartz: SUN=1 .. SAT=7. Python weekday(): MON=0 .. SUN=6.
_DOW = {d: i + 1 for i, d in enumerate(
    "SUN MON TUE WED THU FRI SAT".split()
)}


def _expand(field: str, lo: int, hi: int, names: dict[str, int]) -> frozenset[int]:
    """One cron field → the set of matching values."""
    out: set[int] = set()
    for part in field.split(","):
        part = part.strip().upper()
        if not part:
            raise ValueError(f"empty cron field part in {field!r}")
        # calendar-position forms: "L", "L-3", "15W", "LW", "6#3" —
        # match the exact shapes so month/day NAMES containing those
        # letters (JUL, WED, ...) pass through to name resolution
        import re as _re

        if (
            "#" in part
            or _re.fullmatch(r"L(-\d+)?", part)
            or _re.fullmatch(r"\d*LW?", part)
            or _re.fullmatch(r"\d+W", part)
        ):
            raise ValueError(
                f"unsupported Quartz calendar form {part!r} (L/W/#)"
            )
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron step must be >= 1: {step}")
            if part == "*" or part == "?":
                part = f"{lo}-{hi}"
            elif "-" not in part:
                # Quartz "n/step" means n, n+step, ... to field max
                part = f"{int(names.get(part, part) if not part.isdigit() else part)}-{hi}"
        if part in ("*", "?"):
            out.update(range(lo, hi + 1))
            continue
        if "-" in part:
            a_s, b_s = part.split("-", 1)
            a = names.get(a_s, a_s)
            b = names.get(b_s, b_s)
            a, b = int(a), int(b)
        else:
            a = b = int(names.get(part, part))
        if not (lo <= a <= hi and lo <= b <= hi):
            raise ValueError(f"cron value out of range [{lo},{hi}]: {part!r}")
        if a <= b:
            out.update(range(a, b + 1, step))
        else:  # wrapping range (e.g. FRI-MON)
            out.update(range(a, hi + 1, step))
            out.update(range(lo, b + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class QuartzCron:
    """A parsed ``job.schedule`` expression."""

    expression: str
    seconds: frozenset[int]
    minutes: frozenset[int]
    hours: frozenset[int]
    days_of_month: frozenset[int]
    months: frozenset[int]
    days_of_week: frozenset[int]  # Quartz numbering: SUN=1..SAT=7
    dom_restricted: bool
    dow_restricted: bool

    def _day_matches(self, dt: datetime) -> bool:
        """Quartz day logic: with one of dom/dow at ``?``/``*``, the
        other decides. Both-restricted is rejected by
        parse_quartz_cron (as real Quartz does); the OR-union branch
        below only serves hand-built QuartzCron instances."""
        dom_ok = dt.day in self.days_of_month
        dow_ok = ((dt.weekday() + 1) % 7 + 1) in self.days_of_week
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        if self.dom_restricted:
            return dom_ok
        if self.dow_restricted:
            return dow_ok
        return True

    def matches(self, dt: datetime) -> bool:
        return (
            dt.second in self.seconds
            and dt.minute in self.minutes
            and dt.hour in self.hours
            and dt.month in self.months
            and self._day_matches(dt)
        )

    def next_fire_time(self, after: datetime) -> datetime:
        """The first trigger time STRICTLY after ``after`` — what Quartz
        logs as ``Next run`` when the reference schedules the job
        (JobScheduler.java:400). Scans day-by-day with in-day field
        sets, bounded at 4 years (past which the expression matches
        nothing reachable — e.g. Feb 30)."""
        sec_sorted = sorted(self.seconds)
        min_sorted = sorted(self.minutes)
        hr_sorted = sorted(self.hours)
        t = after + timedelta(seconds=1)
        t = t.replace(microsecond=0)
        day = t.date()
        for _ in range(1462):  # 4 years of days
            probe = datetime(day.year, day.month, day.day)
            if probe.month in self.months and self._day_matches(probe):
                start_h = t.hour if day == t.date() else 0
                for h in hr_sorted:
                    if h < start_h:
                        continue
                    start_m = t.minute if (day == t.date() and h == t.hour) else 0
                    for m in min_sorted:
                        if m < start_m:
                            continue
                        start_s = (
                            t.second
                            if (day == t.date() and h == t.hour and m == t.minute)
                            else 0
                        )
                        for s in sec_sorted:
                            if s >= start_s:
                                return datetime(
                                    day.year, day.month, day.day, h, m, s
                                )
            day = day + timedelta(days=1)
        raise ValueError(
            f"no fire time within 4 years for {self.expression!r}"
        )


def parse_quartz_cron(expression: str) -> QuartzCron:
    """Parse a Quartz cron expression (6 or 7 fields; the optional year
    field is accepted and must be ``*`` — year pinning is a config
    smell this engine refuses to encode silently)."""
    fields = expression.split()
    if len(fields) == 7:
        if fields[6] not in ("*", "?"):
            raise ValueError(
                f"year field must be '*' (got {fields[6]!r}) — pin years "
                "in the orchestrator, not the job spec"
            )
        fields = fields[:6]
    if len(fields) != 6:
        raise ValueError(
            f"job.schedule must be a 6/7-field Quartz cron, got "
            f"{len(fields)} fields: {expression!r}"
        )
    sec, minute, hour, dom, month, dow = fields
    if dom not in ("*", "?") and dow not in ("*", "?"):
        # Real Quartz rejects specifying both day-of-month AND
        # day-of-week (UnsupportedOperationException in CronExpression)
        # rather than applying the classic-cron OR-union — silently
        # computing union fire times the reference's scheduler would
        # never produce is worse than refusing the spec.
        raise ValueError(
            "job.schedule: specifying both a day-of-month and a "
            f"day-of-week is not supported by Quartz — use '?' for one "
            f"of them: {expression!r}"
        )
    return QuartzCron(
        expression=expression,
        seconds=_expand(sec, 0, 59, {}),
        minutes=_expand(minute, 0, 59, {}),
        hours=_expand(hour, 0, 23, {}),
        days_of_month=_expand(dom, 1, 31, {}),
        months=_expand(month, 1, 12, _MONTHS),
        days_of_week=_expand(dow, 1, 7, _DOW),
        dom_restricted=dom not in ("*", "?"),
        dow_restricted=dow not in ("*", "?"),
    )


@dataclass(frozen=True)
class JobSchedule:
    """The scheduling contract compiled from a job spec
    (JobScheduler.scheduleJob:360-407 semantics)."""

    cron: QuartzCron | None  # None -> one-time job (:518 runonce)
    run_once: bool
    disabled: bool  # job.disabled=true -> never runs (:366-370)


def compile_schedule(props: dict[str, str]) -> JobSchedule:
    """Read ``job.schedule`` / ``job.runonce`` / ``job.disabled`` from a
    ``.pull`` properties dict. A spec WITHOUT ``job.schedule`` is a
    one-time job, exactly the reference's
    scheduleGeneralConfiguredJobs:518 defaulting."""
    expr = props.get("job.schedule", "").strip()
    cron = parse_quartz_cron(expr) if expr else None
    run_once = (
        props.get("job.runonce", "false").lower() == "true" or cron is None
    )
    disabled = props.get("job.disabled", "false").lower() == "true"
    return JobSchedule(cron=cron, run_once=run_once, disabled=disabled)


class ScheduleDriver:
    """The in-process "run jobs when due" loop — JobScheduler's
    scheduleJob/startGeneralJobExecutor semantics
    (gobblin-runtime ``scheduler/JobScheduler.java:360-407``: a
    registered spec gets a trigger from ``job.schedule``; ``:518``: a
    spec without one is scheduled run-once; ``:366-370``: disabled
    specs are never scheduled) with an INJECTED clock: no daemon, no
    sleeps — ``tick(now)`` fires everything due in ``(last_tick,
    now]``. The deployment's orchestrator (or a test) owns time and
    calls ``tick``; each due job runs through the ``runner`` callable
    (``run_job`` in production — one trigger occurrence per fire,
    exactly the delegation contract above).

    Misfire policy: a tick that jumps past several fire times fires
    the job ONCE and reschedules from ``now`` (Quartz's default
    fire-once-then-continue misfire instruction) — firing a backlog of
    missed slots against a batch engine would just re-run the same
    incremental extract N times.
    """

    def __init__(self, runner):
        self.runner = runner
        self._jobs: dict[str, dict] = {}

    def register(
        self, name: str, props: dict[str, str], now: datetime
    ) -> JobSchedule:
        """Compile and schedule one spec. Disabled specs register but
        never fire; run-once specs (no ``job.schedule``, or
        ``job.runonce=true``) fire on the FIRST tick after
        registration; cron specs fire at ``next_fire_time``."""
        sched = compile_schedule(props)
        if sched.disabled:
            nxt = None
        elif sched.cron is None:
            nxt = now  # run-once without a cron: due immediately
        else:
            nxt = sched.cron.next_fire_time(now)
        self._jobs[name] = {
            "props": dict(props),
            "schedule": sched,
            "next": nxt,
            "fired": 0,
        }
        return sched

    def unregister(self, name: str) -> None:
        self._jobs.pop(name, None)

    def next_fire(self, name: str) -> datetime | None:
        return self._jobs[name]["next"]

    def tick(self, now: datetime) -> list[str]:
        """Run every job whose next fire time is <= ``now``; returns
        the fired names (registration order). Run-once jobs fire once
        and deschedule; cron jobs reschedule strictly after ``now``."""
        fired: list[str] = []
        # snapshot: a runner may register/unregister jobs reentrantly
        # (a job spec that schedules a follow-up) without blowing up
        # this iteration; additions are picked up on the NEXT tick
        for name, j in list(self._jobs.items()):
            if self._jobs.get(name) is not j:
                continue  # unregistered (or replaced) mid-tick
            nxt = j["next"]
            if nxt is None or nxt > now:
                continue
            sched: JobSchedule = j["schedule"]
            self.runner(name, j["props"])
            j["fired"] += 1
            fired.append(name)
            if sched.run_once or sched.cron is None:
                j["next"] = None  # descheduled after its single run
            else:
                j["next"] = sched.cron.next_fire_time(now)
        return fired
