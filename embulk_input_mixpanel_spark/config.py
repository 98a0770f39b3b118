"""Ingest configuration with reference-parity validation.

The reference validates config before any work: timezone
(lib/embulk/input/service/base_service.rb:28-31 -> timezone_validator.rb),
date/days sanity (range_generator.rb:20-29), mutually-exclusive output
escape hatches (custom_properties vs unknown_columns,
export_service.rb:32-34), and upper-bound-vs-HWM coherence
(export_service.rb:28-30). Same contract here, as one frozen dataclass
validated at construction — a bad config never reaches the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .plans.windows import ConfigError, validate_timezone

__all__ = ["IngestConfig"]


@dataclass(frozen=True)
class IngestConfig:
    table_path: str
    slice_size: int
    backfill: int = 0
    num_buckets: int = 64
    timezone: str = "UTC"
    allow_partial: bool = False
    # promote_props: discovered props become typed p_* columns (additive
    # evolution). residual_only: everything stays in the props_rest JSON
    # column (the reference's unknown_columns mode). Mutually exclusive by
    # construction, mirroring export_service.rb:32-34.
    promote_props: bool = True
    residual_only: bool = False
    promoted_keys: tuple[str, ...] | None = None
    # KNOWN_KEYS analog (reference: export_service.rb:14-18): system
    # property keys that are never custom data — excluded from both
    # auto-promotion and the residual props_rest JSON.
    reserved_keys: tuple[str, ...] = ()
    retry_limit: int = 5
    retry_initial_wait: float = 1.0

    def __post_init__(self) -> None:
        if self.slice_size <= 0:
            raise ConfigError(f"slice_size {self.slice_size} must be positive")
        if self.backfill < 0:
            raise ConfigError(f"backfill {self.backfill} must be >= 0")
        if self.num_buckets <= 0:
            raise ConfigError(f"num_buckets {self.num_buckets} must be positive")
        if self.retry_limit < 0:
            raise ConfigError("retry_limit must be >= 0")
        if self.promote_props and self.residual_only:
            raise ConfigError(
                "promote_props and residual_only are mutually exclusive "
                "(custom_properties vs unknown_columns analog)"
            )
        if self.residual_only and self.promoted_keys:
            raise ConfigError("promoted_keys has no effect with residual_only")
        validate_timezone(self.timezone)

    @property
    def auto_evolve(self) -> bool:
        return self.promote_props and self.promoted_keys is None

    def apply_kwargs(self) -> dict:
        """kwargs for operators.apply.apply_batch."""
        reserved = {"reserved_keys": list(self.reserved_keys)}
        if self.residual_only:
            return {"promoted_keys": [], "auto_evolve": False, **reserved}
        return {
            "promoted_keys": list(self.promoted_keys) if self.promoted_keys else None,
            "auto_evolve": self.auto_evolve,
            **reserved,
        }
