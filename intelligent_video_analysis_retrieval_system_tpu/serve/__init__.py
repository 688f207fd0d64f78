"""Serving & distribution layer (L4): REST, WebSocket, LAN P2P.

Replaces the reference's ``api.py`` stack (Flask + eventlet + socketio) with
an asyncio/aiohttp implementation. The P2P layer keeps the reference's
desktop-sharing capability (UDP discovery + HTTP data plane); *pod-scale*
distribution lives in ``parallel`` (ICI collectives), not here.
"""

from .handlers import RateLimiter, RequestHandler, format_results
from .batching import QueryBatcher
from .rest import RetrievalServer
from .p2p import (
    NetworkDiscovery,
    NetworkServer,
    NetworkClient,
    RemoteUnifiedIndex,
)

__all__ = [
    "RateLimiter",
    "QueryBatcher",
    "RequestHandler",
    "format_results",
    "RetrievalServer",
    "NetworkDiscovery",
    "NetworkServer",
    "NetworkClient",
    "RemoteUnifiedIndex",
]
