"""AAD service-principal token auth for Azure SQL targets (SURVEY §2.1
S8 — `Functions/New-AzureSQLDbConnectionWithCert.ps1:34-64`).

The reference signs in as a service principal with a machine-store
certificate (`Connect-AzAccount ... -CertificateThumbprint`), acquires a
token for ``https://database.windows.net/`` and attaches it to the
SqlConnection's ``AccessToken`` (ps1:44-62). The Spark-side equivalent
is the mssql-jdbc driver's ``accessToken`` connection property — same
token, same resource, injected per connection.

Token *acquisition* is pluggable: a ``token_provider`` is any zero-arg
callable returning the bearer token string. ``certificate_token_provider``
builds one from MSAL's confidential-client certificate flow (the public
equivalent of the reference's Az.Accounts call); it is import-gated
because the MSAL library is not available in every runtime. Tokens are
acquired lazily at call time — one fresh token per run, matching the
reference's acquire-per-connection behavior (ps1:36-44).
"""

from __future__ import annotations

from collections.abc import Callable

DATABASE_SCOPE = "https://database.windows.net/.default"

TokenProvider = Callable[[], str]


def aad_connection_properties(
    token_provider: TokenProvider,
    base_properties: dict[str, str] | None = None,
) -> dict[str, str]:
    """JDBC connection properties with a freshly acquired AAD token.

    The provider runs NOW (token lifetime starts at call time — callers
    build properties per run, not per process). The reference strips any
    "Bearer " prefix before use (ps1:55); mirrored here so providers can
    return either form. Base properties are not mutated.
    """
    token = token_provider()
    if not token:
        raise ValueError("token provider returned an empty access token")
    props = dict(base_properties or {})
    props["accessToken"] = token.removeprefix("Bearer ")
    # mssql-jdbc requires encryption for token auth; the reference's
    # SqlClient enforces TLS1.2 the same way (ps1:35)
    props.setdefault("encrypt", "true")
    return props


def certificate_token_provider(
    tenant_id: str,
    client_id: str,
    private_key_pem: str,
    certificate_thumbprint: str,
    scope: str = DATABASE_SCOPE,
) -> TokenProvider:
    """Provider using the MSAL confidential-client certificate flow —
    the public equivalent of the reference's
    ``Connect-AzAccount -ServicePrincipal -CertificateThumbprint``
    (ps1:37) + ``Get-AzAccessToken -ResourceUrl`` (ps1:43).

    Import-gated: raises ``NotImplementedError`` at acquisition time if
    the ``msal`` package is absent (it is not bundled in this
    container); the rest of the engine is unaffected.
    """

    def provider() -> str:
        try:
            import msal
        except ImportError as exc:  # pragma: no cover - environment-dependent
            raise NotImplementedError(
                "certificate_token_provider needs the 'msal' package; "
                "install it in the production runtime or supply a custom "
                "token_provider"
            ) from exc
        app = msal.ConfidentialClientApplication(
            client_id,
            authority=f"https://login.microsoftonline.com/{tenant_id}",
            client_credential={
                "private_key": private_key_pem,
                "thumbprint": certificate_thumbprint,
            },
        )
        result = app.acquire_token_for_client(scopes=[scope])
        if "access_token" not in result:
            raise RuntimeError(
                f"AAD token acquisition failed: {result.get('error_description', result)}"
            )
        return result["access_token"]

    return provider
