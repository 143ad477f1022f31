"""Native client bridge bindings (device-app equivalent of the reference's
iOS/Android shims, examples/swiftui/.../MioTTSLocalBridge.h)."""

from .client import MioTPUClient, build_client_lib  # noqa: F401
