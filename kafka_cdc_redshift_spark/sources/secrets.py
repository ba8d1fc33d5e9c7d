"""Secrets source (S8): warehouse credentials from a secrets manager.

Parity with the reference's `_get_secret()` (cdc_util/redshift_sink.py:
621-645): when the job config carries `redshift_secret_id`, credentials are
fetched from AWS Secrets Manager and override the plaintext config values;
the secret payload follows the public AWS Redshift secret convention — a
JSON object with `username`/`password` (optionally `host`/`port`/`dbname`).

boto3 is not part of the engine's dependencies; the client is injected
(tests) or constructed lazily behind an import-try, and a plain
environment-variable override (REDSHIFT_USERNAME / REDSHIFT_PASSWORD) is
the dependency-free fallback.
"""

from __future__ import annotations

import base64
import json
import os


class SecretsUnavailable(RuntimeError):
    pass


def fetch_secret(secret_id: str, *, region: str | None = None, client=None) -> dict:
    """Fetch + parse one secret. `client` is any object with
    get_secret_value(SecretId=...) -> {"SecretString": ...} — boto3's
    secretsmanager client in production, a stub in tests."""
    if client is None:
        try:
            import boto3  # noqa: PLC0415 - optional dependency
        except ImportError as exc:
            raise SecretsUnavailable(
                "boto3 not installed; inject a client or use env-var credentials"
            ) from exc
        client = boto3.session.Session(region_name=region).client(
            "secretsmanager", region_name=region
        )
    resp = client.get_secret_value(SecretId=secret_id)
    if "SecretString" in resp:
        raw = resp["SecretString"]
    else:
        raw = base64.b64decode(resp["SecretBinary"]).decode("utf-8")
    try:
        return json.loads(raw)
    except (TypeError, ValueError) as exc:
        raise SecretsUnavailable(f"secret {secret_id} is not JSON") from exc


def resolve_credentials(
    props: dict[str, str], *, client=None, environ: dict[str, str] | None = None
) -> dict[str, str]:
    """Resolution order (most to least specific), per connection field:
      1. secrets manager (when `redshift_secret_id` is set) — the
         reference's primary path
      2. REDSHIFT_USERNAME / REDSHIFT_PASSWORD environment variables
      3. plaintext `redshift_username` / `redshift_password` config keys
    Returns {user, password, host, port, database} ready for the sink."""
    env = os.environ if environ is None else environ
    out = {
        "user": env.get("REDSHIFT_USERNAME") or props.get("redshift_username", ""),
        "password": env.get("REDSHIFT_PASSWORD") or props.get("redshift_password", ""),
        "host": props.get("redshift_host", ""),
        "port": props.get("redshift_port", "5439"),
        "database": props.get("redshift_database", "dev"),
    }
    secret_id = props.get("redshift_secret_id", "").strip()
    if secret_id:
        secret = fetch_secret(
            secret_id, region=props.get("aws_region") or None, client=client
        )
        out["user"] = str(secret.get("username", out["user"]))
        out["password"] = str(secret.get("password", out["password"]))
        if secret.get("host"):
            out["host"] = str(secret["host"])
        if secret.get("port"):
            out["port"] = str(secret["port"])
        if secret.get("dbname"):
            out["database"] = str(secret["dbname"])
    return out
