"""Pluggable configuration / secrets providers.

The reference resolves credentials through two layers: ``decouple``
env-var indirection (reference ``bexley_spark_stream_msk_es.py:44-52``)
and AWS Secrets Manager (``bexley_load_auth_from_secrets_manager_v01.py:12-38``,
a boto3 ``get_secret_value`` call returning a JSON blob that the caller
unpacks at ``bexley_spark_stream_msk_es.py:75-100``).

Our engine abstracts that behind a ``ConfigProvider`` protocol so
pipelines are testable without AWS: tests use ``DictConfig``; prod can
chain env → Secrets Manager.  boto3 is gated behind an import-try —
it is not a dependency of the engine.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping
from typing import Any, Protocol


class ConfigProvider(Protocol):
    """Minimal key→value lookup with a default."""

    def get(self, key: str, default: Any = None) -> Any: ...


class DictConfig:
    """In-memory provider — the test double for every other backend."""

    def __init__(self, values: Mapping[str, Any] | None = None) -> None:
        self._values = dict(values or {})

    def get(self, key: str, default: Any = None) -> Any:
        return self._values.get(key, default)


class EnvConfig:
    """Environment-variable provider (reference's ``decouple.config`` role)."""

    def __init__(self, prefix: str = "") -> None:
        self._prefix = prefix

    def get(self, key: str, default: Any = None) -> Any:
        return os.environ.get(f"{self._prefix}{key}", default)


class JsonFileConfig:
    """Flat-JSON-file provider (a dotfile stand-in for Secrets Manager)."""

    def __init__(self, path: str) -> None:
        with open(path, encoding="utf-8") as f:
            self._values = json.load(f)

    def get(self, key: str, default: Any = None) -> Any:
        return self._values.get(key, default)


class SecretsManagerConfig:
    """AWS Secrets Manager provider — parity with the reference's loader.

    Fetches one named secret (a JSON object) and serves its keys.
    Mirrors ``get_secret_from_sm`` (reference
    ``bexley_load_auth_from_secrets_manager_v01.py:12-38``) including the
    binary-secret fallback.  Requires boto3 at call time only.
    """

    def __init__(self, secret_name: str, region_name: str = "eu-west-2") -> None:
        self._secret_name = secret_name
        self._region_name = region_name
        self._values: dict[str, Any] | None = None

    def _load(self) -> dict[str, Any]:
        if self._values is None:
            try:
                import base64

                import boto3  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - env without boto3
                raise RuntimeError(
                    "SecretsManagerConfig requires boto3; use DictConfig/"
                    "EnvConfig/JsonFileConfig in environments without AWS"
                ) from exc
            client = boto3.session.Session().client(
                service_name="secretsmanager", region_name=self._region_name
            )
            response = client.get_secret_value(SecretId=self._secret_name)
            if "SecretString" in response:
                raw = response["SecretString"]
            else:  # pragma: no cover - binary secrets
                raw = base64.b64decode(response["SecretBinary"]).decode("utf-8")
            self._values = json.loads(raw)
        return self._values

    def get(self, key: str, default: Any = None) -> Any:
        return self._load().get(key, default)


class ChainConfig:
    """First-hit-wins chain (e.g. env overrides Secrets Manager)."""

    def __init__(self, *providers: ConfigProvider) -> None:
        self._providers = providers

    def get(self, key: str, default: Any = None) -> Any:
        sentinel = object()
        for provider in self._providers:
            value = provider.get(key, sentinel)
            if value is not sentinel:
                return value
        return default
