"""Per-host circuit breaker — batch-level analog of SURVEY.md A23.

The reference breaker (/root/reference/crates/ares-core/src/
circuit_breaker.rs:43-72): Closed → Open after 5 consecutive failures;
Open rejects for a recovery timeout; HalfOpen closes after 2 successes.
In the generation loop the unit of time is a batch, so: a host whose
fetches ALL fail in a generation accrues those failures; at ≥ threshold
the host opens and is skipped for ``recovery_generations``; it then goes
half-open with a small probe budget; 2 probe successes close it, any
probe failure reopens (with doubled recovery, capped — mirroring the
429 ×2/cap-300s rule at batch granularity).

Driver-side state, serialized into the lineage manifest for resume.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class HostState:
    state: str = "closed"  # closed | open | half_open
    consecutive_failures: int = 0
    open_until_gen: int = -1
    half_open_successes: int = 0
    recovery_gens: int = 1


@dataclass
class CircuitBreaker:
    failure_threshold: int = 5
    base_recovery_gens: int = 1
    max_recovery_gens: int = 10
    half_open_probe_budget: int = 2
    hosts: dict = field(default_factory=dict)

    def _host(self, host: str) -> HostState:
        hs = self.hosts.get(host)
        if hs is None:
            hs = HostState(recovery_gens=self.base_recovery_gens)
            self.hosts[host] = hs
        return hs

    def claim_budget(self, host: str, generation: int) -> int | None:
        """None = unlimited; 0 = skip host this generation."""
        hs = self.hosts.get(host)
        if hs is None or hs.state == "closed":
            return None
        if hs.state == "open":
            if generation >= hs.open_until_gen:
                hs.state = "half_open"
                hs.half_open_successes = 0
                return self.half_open_probe_budget
            return 0
        return self.half_open_probe_budget

    def record(self, host: str, successes: int, failures: int, generation: int) -> None:
        hs = self._host(host)
        if failures > 0 and successes == 0:
            hs.consecutive_failures += failures
        elif successes > 0:
            if hs.state == "half_open":
                hs.half_open_successes += successes
                if hs.half_open_successes >= 2 and failures == 0:
                    # fully recovered: drop the entry so the tracked set
                    # stays bounded by currently failing/recovering hosts
                    # (the driver-side state must not grow with every host
                    # that ever failed once)
                    del self.hosts[host]
                    return
            else:
                hs.consecutive_failures = 0
                if hs.state == "closed" and failures == 0:
                    del self.hosts[host]
                    return
        if hs.state == "half_open" and failures > 0:
            hs.recovery_gens = min(hs.recovery_gens * 2, self.max_recovery_gens)
            hs.state = "open"
            hs.open_until_gen = generation + 1 + hs.recovery_gens
            return
        if hs.state == "closed" and hs.consecutive_failures >= self.failure_threshold:
            hs.state = "open"
            hs.open_until_gen = generation + 1 + hs.recovery_gens

    # -- persistence -------------------------------------------------------

    def to_dict(self) -> dict:
        return {
            "failure_threshold": self.failure_threshold,
            "base_recovery_gens": self.base_recovery_gens,
            "max_recovery_gens": self.max_recovery_gens,
            "half_open_probe_budget": self.half_open_probe_budget,
            "hosts": {h: asdict(s) for h, s in self.hosts.items()},
        }

    @classmethod
    def from_dict(cls, d: dict) -> "CircuitBreaker":
        cb = cls(
            failure_threshold=d.get("failure_threshold", 5),
            base_recovery_gens=d.get("base_recovery_gens", 1),
            max_recovery_gens=d.get("max_recovery_gens", 10),
            half_open_probe_budget=d.get("half_open_probe_budget", 2),
        )
        cb.hosts = {h: HostState(**s) for h, s in d.get("hosts", {}).items()}
        return cb
