"""Real-LLM policy adapter for the agent loop (reference
agent.py:146-152, tool_schemas.py:11-103).

The reference drives its tool loop through
``InferenceClient.chat_completion(model=..., messages=..., tools=
TOOL_SCHEMAS, tool_choice="auto", max_tokens=1000)`` — the OpenAI-style
function-calling wire format. The engine's loop
(``agent_loop.ResearchAgent``) replays the same machinery against an
injectable *policy* so the deterministic default stays oracle-checkable;
this module supplies the missing fidelity piece: a policy class that
speaks that exact wire format to a real chat-completions endpoint,
env-gated the same way the embedder/NER/reranker seams are
(functions/embedding.py, functions/ner.py, functions/rerank.py:13).

- default (env unset): ``policy_from_env()`` returns None and the
  deterministic ``agent_loop.default_policy`` stays in charge — the
  hash-checked engine never depends on a network;
- ``$SPARK_GRAFT_LLM_ENDPOINT`` (an OpenAI-compatible base URL, e.g.
  ``http://localhost:8000/v1``) + optional ``$SPARK_GRAFT_LLM_MODEL`` /
  ``$SPARK_GRAFT_LLM_API_KEY``: ``ChatCompletionsPolicy`` POSTs
  ``/chat/completions`` and translates between the loop's internal
  message shape and the wire schema.

Translation contract (the part the wire tests pin):

- internal assistant turns carry ``tool_calls: [{name, arguments:
  dict}]``; on the wire each becomes ``{id, type: "function",
  function: {name, arguments: <JSON string>}}`` with deterministic
  synthesized ids (``call_0``, ``call_1``, …) — the reference builds
  the identical structure at agent.py:156-170;
- internal tool turns are ``{role: "tool", content: <json>}``; on the
  wire each gains the ``tool_call_id`` of its positionally matching
  assistant call (agent.py:193-197);
- a response message with ``tool_calls`` maps back to the internal
  ``{"tool_calls": [{name, arguments: <parsed dict>}]}``; a plain
  content message maps to ``{"content": str}`` — the loop's two
  branches (agent.py:156/199-202).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

LLM_ENDPOINT_ENV = "SPARK_GRAFT_LLM_ENDPOINT"
LLM_MODEL_ENV = "SPARK_GRAFT_LLM_MODEL"
LLM_API_KEY_ENV = "SPARK_GRAFT_LLM_API_KEY"

DEFAULT_MODEL = "meta-llama/Llama-3.2-3B-Instruct"  # agent.py:31
DEFAULT_MAX_TOKENS = 1000  # agent.py:151

# The engine's tool surface in OpenAI function-calling schema — same
# four tools, same parameter contracts as the reference's
# tool_schemas.py:11-103, re-described for the Spark-backed agent_api.
TOOL_SCHEMAS: list[dict[str, Any]] = [
    {
        "name": "search_papers",
        "description": (
            "Embedding-based retrieval over the paper corpus: returns "
            "the text chunks closest to the query by cosine similarity. "
            "Call this first for content questions."
        ),
        "parameters": {
            "type": "object",
            "properties": {
                "query": {
                    "type": "string",
                    "description": "Natural language search query.",
                },
                "top_k": {
                    "type": "integer",
                    "description": "Number of results to return. Default is 5.",
                    "default": 5,
                },
            },
            "required": ["query"],
        },
    },
    {
        "name": "get_paper_details",
        "description": (
            "Look up one paper's full metadata row by paper_id (ids come "
            "from search_papers results)."
        ),
        "parameters": {
            "type": "object",
            "properties": {
                "paper_id": {
                    "type": "string",
                    "description": "Paper ID from search_papers results.",
                }
            },
            "required": ["paper_id"],
        },
    },
    {
        "name": "search_knowledge_graph",
        "description": (
            "1-hop co-occurrence neighborhood lookup in the entity graph "
            "— for how-are-X-and-Y-connected style questions."
        ),
        "parameters": {
            "type": "object",
            "properties": {
                "entities": {
                    "type": "array",
                    "items": {"type": "string"},
                    "description": "Entity names to look up.",
                },
                "top_k": {
                    "type": "integer",
                    "description": "Max related entities. Default is 10.",
                    "default": 10,
                },
            },
            "required": ["entities"],
        },
    },
    {
        "name": "summarize_context",
        "description": (
            "Render the retrieved chunks into the final cited answer; "
            "the mandatory step after retrieval."
        ),
        "parameters": {
            "type": "object",
            "properties": {
                "question": {
                    "type": "string",
                    "description": "The user's original question.",
                },
                "chunks": {
                    "type": "array",
                    "items": {"type": "object"},
                    "description": (
                        "Chunks to summarize; omitted chunks default to "
                        "the last search results."
                    ),
                },
            },
            "required": ["question"],
        },
    },
]

# transport: payload dict -> parsed response-JSON dict. Injectable for
# tests; the default POSTs to the configured endpoint.
Transport = Callable[[dict[str, Any]], dict[str, Any]]


def _http_transport(endpoint: str, api_key: str | None) -> Transport:
    """POST ``{endpoint}/chat/completions`` with urllib — no extra deps.
    Only constructed when the env gate is set; never on engine paths."""
    import urllib.request

    url = endpoint.rstrip("/") + "/chat/completions"

    def send(payload: dict[str, Any]) -> dict[str, Any]:
        headers = {"Content-Type": "application/json"}
        if api_key:
            headers["Authorization"] = f"Bearer {api_key}"
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), headers=headers
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            return json.loads(resp.read().decode())

    return send


class ChatCompletionsPolicy:
    """An ``agent_loop.Policy`` backed by a chat-completions endpoint.

    Stateless between calls except the monotonically increasing
    tool-call id counter (ids must stay unique across a conversation so
    a transcript round-trips through providers that key on them)."""

    def __init__(
        self,
        transport: Transport,
        model: str = DEFAULT_MODEL,
        max_tokens: int = DEFAULT_MAX_TOKENS,
    ) -> None:
        self.transport = transport
        self.model = model
        self.max_tokens = max_tokens
        self._next_id = 0

    # -- internal -> wire -------------------------------------------------

    def _wire_messages(self, messages: list[dict]) -> list[dict]:
        wire: list[dict] = []
        pending_ids: list[str] = []
        for m in messages:
            role = m["role"]
            if role == "assistant" and m.get("tool_calls"):
                calls = []
                pending_ids = []
                for tc in m["tool_calls"]:
                    cid = f"call_{self._next_id}"
                    self._next_id += 1
                    pending_ids.append(cid)
                    calls.append(
                        {
                            "id": cid,
                            "type": "function",
                            "function": {
                                "name": tc["name"],
                                "arguments": json.dumps(
                                    tc.get("arguments", {}), default=str
                                ),
                            },
                        }
                    )
                wire.append(
                    {
                        "role": "assistant",
                        "content": m.get("content", "") or "",
                        "tool_calls": calls,
                    }
                )
            elif role == "tool":
                if pending_ids:
                    cid = pending_ids.pop(0)
                else:
                    # orphan tool turn (no matching assistant tool_calls):
                    # synthesize a FRESH id — consecutive orphans sharing
                    # one id would break the uniqueness contract above
                    cid = f"call_{self._next_id}"
                    self._next_id += 1
                wire.append(
                    {
                        "role": "tool",
                        "tool_call_id": cid,
                        "content": m["content"],
                    }
                )
            else:
                wire.append({"role": role, "content": m["content"]})
        return wire

    # -- the policy call ---------------------------------------------------

    def __call__(self, messages: list[dict]) -> dict[str, Any]:
        payload = {
            "model": self.model,
            "messages": self._wire_messages(messages),
            "tools": [
                {"type": "function", "function": schema}
                for schema in TOOL_SCHEMAS
            ],
            "tool_choice": "auto",  # agent.py:150
            "max_tokens": self.max_tokens,  # agent.py:151
        }
        response = self.transport(payload)
        msg = response["choices"][0]["message"]
        tool_calls = msg.get("tool_calls") or []
        if tool_calls:
            return {
                "content": msg.get("content") or "",
                "tool_calls": [
                    {
                        "name": tc["function"]["name"],
                        "arguments": _parse_arguments(
                            tc["function"].get("arguments")
                        ),
                    }
                    for tc in tool_calls
                ],
            }
        return {"content": msg.get("content") or ""}


def _parse_arguments(raw: str | None) -> dict:
    """Tolerant parse of a function-call arguments string: small models
    routinely emit malformed JSON, and an uncaught decode error here
    would crash the agent loop mid-conversation — degrade to {} (the
    dispatcher then surfaces the tool's own missing-argument error as a
    normal tool turn the model can react to)."""
    try:
        parsed = json.loads(raw or "{}")
    except (json.JSONDecodeError, TypeError):
        return {}
    return parsed if isinstance(parsed, dict) else {}


def policy_from_env(transport: Transport | None = None):
    """The env gate (reranker-seam pattern, functions/rerank.py:101-125):
    None when ``$SPARK_GRAFT_LLM_ENDPOINT`` is unset and no transport is
    injected — the deterministic default policy stays in charge."""
    endpoint = os.environ.get(LLM_ENDPOINT_ENV)
    if transport is None:
        if not endpoint:
            return None
        transport = _http_transport(
            endpoint, os.environ.get(LLM_API_KEY_ENV)
        )
    return ChatCompletionsPolicy(
        transport, model=os.environ.get(LLM_MODEL_ENV, DEFAULT_MODEL)
    )
