"""appsettings-shaped configuration for the lifecycle engine — the
reference's entire tuning surface is an `IConfiguration` tree read by
the worker (src/Argus.Sync/Workers/CardanoIndexWorker.cs:54-72 and the
rollback-mode block ibid:181-202), the provider factory
(Providers/ConfigurationChainProviderFactory.cs:13-66), the reducer
registrar (Extensions/ReducerExtension.cs:44-47), and the single-
instance locks (MongoSingleInstanceLock.cs:54-55,
PostgresSingleInstanceLock.cs:64-65); a user switching from the
reference brings an ``appsettings.json`` and expects the same keys to
mean the same things. This module reads THAT shape (colon-separated
key paths, identical defaults and clamps) and maps it onto the
rebuild's constructors:

  reference key                                   → rebuild knob
  ------------------------------------------------------------------
  Sync:Commit:BatchSize            (500, min 1)   → IndexDriver.batch_size
  Sync:Commit:MaxDelayMs           (1000, min 1)  → IndexDriver.max_delay_s
                                                    + the continuous-mode
                                                    trigger interval (A9)
  CardanoNodeConnection:MaxRollbackSlots (10_000) → IndexDriver.max_rollback_slots
  CardanoNodeConnection:RollbackBuffer   (10)     → IndexDriver.window_k
  Sync:Pipeline:ChannelCapacity    (256)          → StreamingIndexer.max_files_per_trigger
                                                    (the bounded-inbox analogue, A6)
  CardanoNodeConnection:NetworkMagic (2)          → carried for connectors
  CardanoNodeConnection:Hash/Slot  (required)     → default start point (A14)
  CardanoNodeConnection:ConnectionType            → ``make_provider()`` dispatch:
    + :UnixSocket:Path                              "UnixSocket" → SocketLineProvider(unix_path)  (N2C)
    + :TCP:{Host,Port,PipelineDepth (100)}          "TCP"        → SocketLineProvider(host, port) (N2N)
    + :gRPC:{Endpoint,ApiKey}                       "gRPC"       → FollowTipShapedProvider       (U5C)
  Sync:SingleInstanceLock:Enabled  (true)         → ``make_lock()`` gate
    + :LeaseSeconds (30, min 2) :RenewSeconds (10, min 1)
    + :PollSeconds  (2, min 1)  :HealthCheckSeconds (5, min 1)
                                                  → SingleInstanceLock cadences (A19)
  CardanoIndexReducers:ActiveReducers             → ``apply_allowlist()`` →
                                                    ReducerRegistry.with_allowlist (A20)
  Sync:Worker:ExitOnCompletion     (true)         → availableNow vs continuous trigger
  Sync:Dashboard:TuiMode (true) / RefreshInterval
                        (1000, clamped ≥ 2000)    → telemetry/dashboard cadence ONLY
  Sync:Dashboard:DisplayType ("Full" = full TUI)  → render_dashboard full vs sync-
                                                    progress mode (Dashboard.cs:18)
  Sync:Rollback:Enabled (false) + Hash (required)
    + Slot (0 = unset)
    + Reducers:<name>:{Enabled,Slot,Hash}         → one-shot startup rewind
                                                    (A17 — ``rewind_plan``; the
                                                    hash is validated against the
                                                    committed checkpoint window)

Unknown keys are REJECTED under the recognized prefixes (a typo like
``Sync:Commit:BatchSiz`` silently reverting to a default is the classic
config foot-gun), and pass through untouched elsewhere (e.g. the
``ConnectionStrings`` section, which belongs to the storage backend).

Booleans are parsed .NET-appsettings-style: JSON ``true``/``false`` or
the STRINGS "true"/"false" (any case) / "1"/"0" — ``bool("false")`` is
True in Python, and a per-reducer ``Enabled: "false"`` opt-out that
gets ignored would destructively rewind the reducer.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

_KNOWN = {
    "Sync:Pipeline:ChannelCapacity",
    "Sync:Commit:BatchSize",
    "Sync:Commit:MaxDelayMs",
    "Sync:Rollback:Enabled",
    "Sync:Rollback:Hash",
    "Sync:Rollback:Slot",
    "Sync:Worker:ExitOnCompletion",
    "Sync:Dashboard:TuiMode",
    "Sync:Dashboard:RefreshInterval",
    "Sync:Dashboard:DisplayType",
    "Sync:SingleInstanceLock:Enabled",
    "Sync:SingleInstanceLock:LeaseSeconds",
    "Sync:SingleInstanceLock:RenewSeconds",
    "Sync:SingleInstanceLock:PollSeconds",
    "Sync:SingleInstanceLock:HealthCheckSeconds",
    "CardanoNodeConnection:MaxRollbackSlots",
    "CardanoNodeConnection:RollbackBuffer",
    "CardanoNodeConnection:NetworkMagic",
    "CardanoNodeConnection:Hash",
    "CardanoNodeConnection:Slot",
    "CardanoNodeConnection:ConnectionType",
    "CardanoNodeConnection:UnixSocket:Path",
    "CardanoNodeConnection:TCP:Host",
    "CardanoNodeConnection:TCP:Port",
    "CardanoNodeConnection:TCP:PipelineDepth",
    "CardanoNodeConnection:gRPC:Endpoint",
    "CardanoNodeConnection:gRPC:ApiKey",
    "CardanoIndexReducers:ActiveReducers",
}
# prefixes under which unknown leaves are config errors
_OWNED_PREFIXES = ("Sync:", "CardanoNodeConnection:", "CardanoIndexReducers:")
# dynamic per-reducer subtree: Sync:Rollback:Reducers:<name>:{Enabled,Slot,Hash}
_REDUCER_PREFIX = "Sync:Rollback:Reducers:"
_CONNECTION_TYPES = ("UnixSocket", "TCP", "gRPC")


class ConfigError(ValueError):
    pass


def _flatten(tree: dict, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path + ":"))
        else:
            out[path] = v
    return out


def _as_bool(path: str, v: Any) -> bool:
    """Strict .NET-style boolean: real bools, "true"/"false" (any case),
    or "1"/"0". Anything else is a config error — NOT Python truthiness
    (``bool("false") is True`` would silently invert opt-outs)."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("true", "1"):
        return True
    if s in ("false", "0"):
        return False
    raise ConfigError(f"{path}: expected a boolean, got {v!r}")


def _as_int(path: str, v: Any) -> int:
    try:
        return int(v)
    except (TypeError, ValueError):
        raise ConfigError(f"{path}: expected an integer, got {v!r}") from None


def _b(flat: dict, path: str, default: bool) -> bool:
    return _as_bool(path, flat[path]) if path in flat else default


def _i(flat: dict, path: str, default: int) -> int:
    return _as_int(path, flat[path]) if path in flat else default


@dataclass
class IndexerConfig:
    """Parsed appsettings with the reference's defaults applied."""

    batch_size: int = 500
    max_delay_s: float = 1.0
    max_rollback_slots: int = 10_000
    window_k: int = 10
    channel_capacity: int = 256
    network_magic: int = 2
    start_hash: str = ""
    start_slot: int = 0
    exit_on_completion: bool = True
    tui_mode: bool = True
    dashboard_refresh_ms: int = 2000
    dashboard_display_type: str | None = None
    connection_type: str | None = None
    unix_socket_path: str | None = None
    tcp_host: str | None = None
    tcp_port: int | None = None
    tcp_pipeline_depth: int = 100
    grpc_endpoint: str | None = None
    grpc_api_key: str | None = None
    lock_enabled: bool = True
    lock_lease_s: int = 30
    lock_renew_s: int = 10
    lock_poll_s: int = 2
    lock_health_s: int = 5
    active_reducers: list[str] | None = None
    rollback_enabled: bool = False
    rollback_hash: str | None = None
    rollback_slot: int | None = None
    rollback_reducers: dict[str, dict[str, Any]] = field(default_factory=dict)
    extras: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, tree: dict) -> "IndexerConfig":
        flat = _flatten(tree)
        reducers: dict[str, dict[str, Any]] = {}
        leftovers: dict[str, Any] = {}
        active: list[str] | None = None
        for path, v in list(flat.items()):
            if path.startswith(_REDUCER_PREFIX):
                rest = path[len(_REDUCER_PREFIX):]
                name, _, leaf = rest.rpartition(":")
                if leaf not in ("Enabled", "Slot", "Hash") or not name:
                    raise ConfigError(f"unrecognized rollback key: {path}")
                reducers.setdefault(name, {})[leaf] = v
                del flat[path]
            elif path.startswith("CardanoIndexReducers:ActiveReducers"):
                # JSON array, or .NET-flattened indexed leaves (...:0, :1)
                suffix = path[len("CardanoIndexReducers:ActiveReducers"):]
                if suffix == "":
                    if not isinstance(v, list):
                        raise ConfigError(
                            f"{path}: expected a list of reducer names"
                        )
                    active = [str(x) for x in v]
                elif suffix[1:].isdigit():
                    active = (active or [])
                    active.append(str(v))
                else:
                    raise ConfigError(f"unrecognized config key: {path}")
                del flat[path]
            elif path not in _KNOWN:
                if path.startswith(_OWNED_PREFIXES):
                    raise ConfigError(
                        f"unrecognized config key: {path} (typo? the "
                        "reference would silently default here)"
                    )
                leftovers[path] = v
                del flat[path]
        if "CardanoNodeConnection:Hash" not in flat:
            raise ConfigError("Default start hash not configured.")
        if "CardanoNodeConnection:Slot" not in flat:
            raise ConfigError("Default start slot not configured.")
        conn_type = flat.get("CardanoNodeConnection:ConnectionType")
        if conn_type is not None and conn_type not in _CONNECTION_TYPES:
            raise ConfigError(
                f"Invalid chain provider connection type: {conn_type}"
            )
        # the reference treats Slot=0 as unset (CardanoIndexWorker.cs:197)
        rb_slot = _i(flat, "Sync:Rollback:Slot", 0)
        return cls(
            batch_size=max(1, _i(flat, "Sync:Commit:BatchSize", 500)),
            max_delay_s=max(1, _i(flat, "Sync:Commit:MaxDelayMs", 1000))
            / 1000.0,
            max_rollback_slots=_i(
                flat, "CardanoNodeConnection:MaxRollbackSlots", 10_000
            ),
            window_k=_i(flat, "CardanoNodeConnection:RollbackBuffer", 10),
            channel_capacity=_i(flat, "Sync:Pipeline:ChannelCapacity", 256),
            network_magic=_i(flat, "CardanoNodeConnection:NetworkMagic", 2),
            start_hash=str(flat["CardanoNodeConnection:Hash"]),
            start_slot=_as_int(
                "CardanoNodeConnection:Slot",
                flat["CardanoNodeConnection:Slot"],
            ),
            exit_on_completion=_b(flat, "Sync:Worker:ExitOnCompletion", True),
            tui_mode=_b(flat, "Sync:Dashboard:TuiMode", True),
            # the reference clamps the refresh to >= 2000 ms
            dashboard_refresh_ms=max(
                _i(flat, "Sync:Dashboard:RefreshInterval", 1000), 2000
            ),
            dashboard_display_type=(
                str(flat["Sync:Dashboard:DisplayType"])
                if "Sync:Dashboard:DisplayType" in flat
                else None
            ),
            connection_type=conn_type,
            unix_socket_path=flat.get("CardanoNodeConnection:UnixSocket:Path"),
            tcp_host=flat.get("CardanoNodeConnection:TCP:Host"),
            tcp_port=(
                _as_int(
                    "CardanoNodeConnection:TCP:Port",
                    flat["CardanoNodeConnection:TCP:Port"],
                )
                if "CardanoNodeConnection:TCP:Port" in flat
                else None
            ),
            tcp_pipeline_depth=_i(
                flat, "CardanoNodeConnection:TCP:PipelineDepth", 100
            ),
            grpc_endpoint=flat.get("CardanoNodeConnection:gRPC:Endpoint"),
            grpc_api_key=flat.get("CardanoNodeConnection:gRPC:ApiKey"),
            lock_enabled=_b(flat, "Sync:SingleInstanceLock:Enabled", True),
            # the reference's minimum clamps: lease >= 2 s, cadences >= 1 s
            lock_lease_s=max(
                2, _i(flat, "Sync:SingleInstanceLock:LeaseSeconds", 30)
            ),
            lock_renew_s=max(
                1, _i(flat, "Sync:SingleInstanceLock:RenewSeconds", 10)
            ),
            lock_poll_s=max(
                1, _i(flat, "Sync:SingleInstanceLock:PollSeconds", 2)
            ),
            lock_health_s=max(
                1,
                _i(flat, "Sync:SingleInstanceLock:HealthCheckSeconds", 5),
            ),
            active_reducers=active,
            rollback_enabled=_b(flat, "Sync:Rollback:Enabled", False),
            rollback_hash=(
                str(flat["Sync:Rollback:Hash"])
                if "Sync:Rollback:Hash" in flat
                else None
            ),
            rollback_slot=rb_slot if rb_slot != 0 else None,
            rollback_reducers=reducers,
            extras=leftovers,
        )

    @classmethod
    def from_json(cls, path: str) -> "IndexerConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def driver_kwargs(self) -> dict[str, Any]:
        """kwargs for ``IndexDriver(spark, registry, store, blocks,
        **cfg.driver_kwargs())``."""
        return {
            "batch_size": self.batch_size,
            "max_delay_s": self.max_delay_s,
            "window_k": self.window_k,
            "max_rollback_slots": self.max_rollback_slots,
        }

    # ---------------- provider / lock / allow-list wiring ----------------

    def make_provider(self):
        """``ConnectionType`` → live transport adapter — the reference's
        provider factory verbatim (ConfigurationChainProviderFactory.cs:
        13-66, including its required-key exceptions): UnixSocket → the
        N2C line protocol over an AF_UNIX socket, TCP → the N2N shape
        with the PipelineDepth cap hint, gRPC → the FollowTip-shaped
        adapter with the ``dmtr-api-key`` header."""
        from argus_spark.sources.providers import (
            FollowTipShapedProvider,
            SocketLineProvider,
        )

        if self.connection_type is None:
            raise ConfigError("Connection type not configured.")
        if self.connection_type == "UnixSocket":
            if not self.unix_socket_path:
                raise ConfigError(
                    "Socket path is not configured for UnixSocket "
                    "connection type."
                )
            return SocketLineProvider(unix_path=self.unix_socket_path)
        if self.connection_type == "TCP":
            if not self.tcp_host:
                raise ConfigError(
                    "Host is not configured for TCP connection type."
                )
            if self.tcp_port is None:
                raise ConfigError(
                    "Port is not configured for TCP connection type."
                )
            return SocketLineProvider(
                self.tcp_host,
                self.tcp_port,
                pipeline_depth=self.tcp_pipeline_depth,
            )
        if not self.grpc_endpoint:
            raise ConfigError(
                "gRPC endpoint is not configured for gRPC connection type."
            )
        if not self.grpc_api_key:
            raise ConfigError(
                "Demeter API key is missing for gRPC connection type."
            )
        return FollowTipShapedProvider(
            self.grpc_endpoint, api_key=self.grpc_api_key
        )

    def make_lock(self, root: str):
        """``Sync:SingleInstanceLock:*`` → :class:`SingleInstanceLock`
        with the reference's cadences, or None when the guard is opted
        out (``Enabled: false`` — PostgresServiceCollectionExtensions
        .cs:41-42)."""
        if not self.lock_enabled:
            return None
        from argus_spark.lifecycle.lock import SingleInstanceLock

        return SingleInstanceLock(
            root,
            lease_s=float(self.lock_lease_s),
            renew_s=float(self.lock_renew_s),
            poll_s=float(self.lock_poll_s),
            health_s=float(self.lock_health_s),
        )

    def apply_allowlist(self, registry):
        """``CardanoIndexReducers:ActiveReducers`` →
        ``ReducerRegistry.with_allowlist`` (ReducerExtension.cs:44-47:
        absent/empty = register everything; unknown or duplicate names
        throw)."""
        if not self.active_reducers:
            return registry
        return registry.with_allowlist(self.active_reducers)

    def dashboard_full(self) -> bool:
        """``Sync:Dashboard:DisplayType == "Full"`` → the full TUI;
        anything else = the basic sync-progress display
        (CardanoIndexWorker.Dashboard.cs:18)."""
        return self.dashboard_display_type == "Full"

    # ---------------- startup rollback mode (A17) ----------------

    def rewind_plan(
        self, reducer_names: list[str]
    ) -> tuple[dict[str, int], list[str], dict[str, dict[str, Any]]] | None:
        """The reference's startup rollback mode
        (CardanoIndexWorker.cs:181-202): when ``Sync:Rollback:Enabled``,
        every reducer rewinds to the default ``Sync:Rollback:Slot``
        unless its ``Reducers:<name>`` block overrides the slot or opts
        out (``Enabled: false``). Per the reference: the HASH is
        required (self ?? default ?? throw), and a slot of 0 means
        unset — it falls through to the default slot (ibid:197). The
        configured point is an INTERSECTION: the reference replays the
        chain FROM it, and the chainsync opening rollback is Exclusive
        — the point's own block is KEPT — so the per-reducer
        delete-from is ``slot + 1`` (the A5 normalization). Returns
        ``(overrides, exclude, points)`` where ``points[name]`` is the
        configured intersection ``{"slot", "hash"}`` — validated
        against the committed checkpoint window by
        :meth:`apply_startup_rewind` — or None when rollback mode is
        off."""
        if not self.rollback_enabled:
            return None
        overrides: dict[str, int] = {}
        exclude: list[str] = []
        points: dict[str, dict[str, Any]] = {}
        for name in reducer_names:
            sub = self.rollback_reducers.get(name, {})
            if not _as_bool(
                f"{_REDUCER_PREFIX}{name}:Enabled", sub.get("Enabled", True)
            ):
                exclude.append(name)
                continue
            # slot 0 = unset, at both levels (CardanoIndexWorker.cs:197)
            self_slot = _as_int(
                f"{_REDUCER_PREFIX}{name}:Slot", sub.get("Slot", 0)
            )
            slot = self_slot if self_slot != 0 else self.rollback_slot
            if slot is None:
                raise ConfigError(
                    f"rollback mode enabled but no slot for reducer "
                    f"{name!r} (set Sync:Rollback:Slot or "
                    f"Sync:Rollback:Reducers:{name}:Slot)"
                )
            hash_ = sub.get("Hash", self.rollback_hash)
            if hash_ is None:
                raise ConfigError(
                    f"Rollback hash not configured for reducer {name!r} "
                    "(set Sync:Rollback:Hash or "
                    f"Sync:Rollback:Reducers:{name}:Hash)"
                )
            overrides[name] = int(slot) + 1  # exclusive: keep the point
            points[name] = {"slot": int(slot), "hash": str(hash_)}
        return overrides, exclude, points

    def apply_startup_rewind(self, driver) -> bool:
        """Run the one-shot startup rewind against a constructed
        ``IndexDriver``; returns True if a rewind happened.

        The configured (hash, slot) is the intersection Point the
        reference hands the chainsync (CardanoIndexWorker.cs:192-200) —
        a wrong hash there makes the node reject the intersection. The
        rebuild validates the same contract against its own source of
        truth: if a reducer's COMMITTED checkpoint window retains a
        point at the configured slot, its hash must match, else the
        rewind is refused (the configured point is not on this chain).
        A slot older than the retained window cannot be validated and
        is accepted — exactly the node's behaviour for a point it still
        has vs one beyond its window."""
        plan = self.rewind_plan([r.name for r in driver.registry])
        if plan is None:
            return False
        overrides, exclude, points = plan
        if not overrides:
            return False
        states = driver.store.reducer_states()  # dict[name, ReducerStateRow]
        for name, pt in points.items():
            st = states.get(name)
            if st is None:
                continue
            committed = {p.slot: p.hash for p in st.window()}
            have = committed.get(pt["slot"])
            if have is not None and have != pt["hash"]:
                raise ConfigError(
                    f"rollback intersection for reducer {name!r} at slot "
                    f"{pt['slot']} has hash {pt['hash']!r} but the "
                    f"committed checkpoint there is {have!r} — the "
                    "configured point is not on this chain; refusing the "
                    "rewind"
                )
        driver.rewind_to(
            min(overrides.values()),
            meta={"reason": "config_rollback_mode", "intersections": points},
            overrides=overrides,
            exclude=exclude,
        )
        return True
