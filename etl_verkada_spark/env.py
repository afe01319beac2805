"""S4 — validated job environment (SURVEY.md §2.1 S4; the reference's
``this.env(InputSchema)``, task.ts:95 with the typebox schema at
task.ts:8-27).

The reference validates its layer environment before any dataflow:
required strings (``API_KEY``, ``API_ORG_ID``), a defaulted enum
(``API_Region in {api, api.eu, api.au}``, task.ts:15-22 — the
CHECK-style constrained value SURVEY §1 calls out), and a defaulted
boolean (``DEBUG``). typebox THROWS on a violation, so a bad layer
config never reaches the fetch loop.

Spark-side equivalent: config is job parameters, not dataflow — so
this is a driver-side declarative schema + parser, mirroring the
validated-ingest discipline the data path already has
(operators/scans.py validate_failfast). ``env()`` accepts a plain
dict (job params), applies defaults, coerces the string forms Spark
confs arrive in (``spark.conf`` values are always strings — "true"
-> True), enforces the enum CHECK, and raises ``ValueError`` naming
every violation at once (a config error should read like a schema
report, not die on the first field).

The derived ``base_url()`` mirrors the reference's URL construction
(``https://{API_Region}.verkada.com``, task.ts:97/129/145/216) — the
enum validation is exactly what makes that interpolation safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

__all__ = ["INPUT_SCHEMA", "EnvField", "env", "base_url"]


@dataclass(frozen=True)
class EnvField:
    """One declared config field (typebox ``Type.String``/``Boolean``
    analogue): python type, optional default (None == required),
    optional closed value set."""

    type: type
    default: Any = None
    required: bool = False
    enum: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


#: the reference's InputSchema (task.ts:8-27), field for field.
INPUT_SCHEMA: dict[str, EnvField] = {
    "API_KEY": EnvField(type=str, required=True, description="API Token"),
    "API_ORG_ID": EnvField(
        type=str, required=True, description="Verkada Organization ID"
    ),
    "API_Region": EnvField(
        type=str, default="api", enum=("api", "api.eu", "api.au")
    ),
    "DEBUG": EnvField(
        type=bool, default=False, description="Print results in logs"
    ),
}

_BOOL_STRINGS = {"true": True, "false": False, "1": True, "0": False}


def env(
    params: dict[str, Any],
    schema: dict[str, EnvField] = INPUT_SCHEMA,
) -> dict[str, Any]:
    """Validate ``params`` against ``schema``; return the complete,
    coerced config. Raises ``ValueError`` listing EVERY violation
    (missing required field, enum violation, or uncoercible type) —
    the typebox throw semantics (task.ts:95: a bad config never
    reaches the fetch loop).

    Unknown keys are tolerated and DROPPED, matching the reference:
    its typebox ``Type.Object`` (task.ts:8-27) does not set
    ``additionalProperties: false``, so a layer environment carrying
    extra keys (deploy metadata, unrelated vars) validates fine and
    the schema simply never reads them (ADVICE r13 — the earlier
    strict rejection was stricter than the behavior it documented
    itself as mirroring).
    """
    errors: list[str] = []
    out: dict[str, Any] = {}
    for name, f in schema.items():
        if name not in params:
            if f.required:
                errors.append(f"missing required field {name!r}")
            else:
                out[name] = f.default
            continue
        v = params[name]
        if f.type is bool and isinstance(v, str):
            # spark.conf / environment values arrive as strings
            low = v.strip().lower()
            if low in _BOOL_STRINGS:
                v = _BOOL_STRINGS[low]
            else:
                errors.append(f"{name}: expected boolean, got {v!r}")
                continue
        if not isinstance(v, f.type) or (
            f.type is not bool and isinstance(v, bool)
        ):
            errors.append(
                f"{name}: expected {f.type.__name__}, "
                f"got {type(v).__name__}"
            )
            continue
        if f.enum and v not in f.enum:
            errors.append(
                f"{name}: {v!r} not in {list(f.enum)}"
            )
            continue
        out[name] = v
    if errors:
        raise ValueError(
            "invalid environment: " + "; ".join(sorted(errors))
        )
    return out


def base_url(validated: dict[str, Any]) -> str:
    """The reference's API base (task.ts:97): only callable on a
    validated config — the enum CHECK is what makes interpolating the
    region into a hostname safe."""
    return f"https://{validated['API_Region']}.verkada.com"
