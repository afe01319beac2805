"""S4 validated environment (env.py — the reference's
``this.env(InputSchema)``, task.ts:95, schema task.ts:8-27)."""

from __future__ import annotations

import pytest

from etl_verkada_spark.env import INPUT_SCHEMA, base_url, env


def test_valid_config_applies_defaults():
    e = env({"API_KEY": "k", "API_ORG_ID": "org"})
    assert e == {
        "API_KEY": "k",
        "API_ORG_ID": "org",
        "API_Region": "api",
        "DEBUG": False,
    }
    assert base_url(e) == "https://api.verkada.com"


@pytest.mark.parametrize("region", ["api", "api.eu", "api.au"])
def test_region_enum_accepts_every_member(region):
    e = env({"API_KEY": "k", "API_ORG_ID": "o", "API_Region": region})
    assert base_url(e) == f"https://{region}.verkada.com"


def test_region_enum_check_throws():
    with pytest.raises(ValueError, match="API_Region.*not in"):
        env({"API_KEY": "k", "API_ORG_ID": "o", "API_Region": "api.us"})


def test_missing_required_reported_together_unknown_dropped():
    with pytest.raises(ValueError) as ei:
        env({"API_TOKEN": "typo"})
    msg = str(ei.value)
    assert "missing required field 'API_KEY'" in msg
    assert "missing required field 'API_ORG_ID'" in msg
    # typebox Type.Object without additionalProperties:false tolerates
    # extra keys (task.ts:8-27) — unknown fields are dropped, not errors
    assert "API_TOKEN" not in msg


def test_unknown_keys_dropped_from_valid_config():
    e = env({"API_KEY": "k", "API_ORG_ID": "o", "DEPLOY_STAGE": "prod"})
    assert "DEPLOY_STAGE" not in e
    assert e["API_Region"] == "api"


def test_bool_coercion_from_conf_strings():
    base = {"API_KEY": "k", "API_ORG_ID": "o"}
    assert env({**base, "DEBUG": "true"})["DEBUG"] is True
    assert env({**base, "DEBUG": "False"})["DEBUG"] is False
    assert env({**base, "DEBUG": True})["DEBUG"] is True
    with pytest.raises(ValueError, match="DEBUG: expected boolean"):
        env({**base, "DEBUG": "yes"})


def test_type_errors_name_the_field():
    with pytest.raises(ValueError, match="API_KEY: expected str, got int"):
        env({"API_KEY": 7, "API_ORG_ID": "o"})
    # a bool is not an acceptable str even though bool subclasses int
    with pytest.raises(ValueError, match="API_ORG_ID: expected str"):
        env({"API_KEY": "k", "API_ORG_ID": True})


def test_schema_mirrors_reference_fields():
    assert set(INPUT_SCHEMA) == {
        "API_KEY", "API_ORG_ID", "API_Region", "DEBUG",
    }
    assert INPUT_SCHEMA["API_Region"].enum == ("api", "api.eu", "api.au")
    assert INPUT_SCHEMA["API_Region"].default == "api"
    assert INPUT_SCHEMA["DEBUG"].default is False
