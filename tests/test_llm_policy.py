"""Wire-format tests for the real-LLM policy adapter (llm_policy.py):
a fake transport records every chat-completions payload and scripts the
model's replies, pinning the OpenAI-style function-calling schema the
reference speaks (agent.py:146-152, tool_schemas.py:11-103) without any
network. The hash-checked engine never exercises this path — the gate
stays closed unless $SPARK_GRAFT_LLM_ENDPOINT is set."""

from __future__ import annotations

import json

import pytest

from cs_5542_lab_6_spark.llm_policy import (
    DEFAULT_MAX_TOKENS,
    DEFAULT_MODEL,
    LLM_ENDPOINT_ENV,
    LLM_MODEL_ENV,
    TOOL_SCHEMAS,
    ChatCompletionsPolicy,
    policy_from_env,
)


def _tool_call_reply(name: str, arguments: dict, cid: str = "srv_1") -> dict:
    return {
        "choices": [
            {
                "message": {
                    "role": "assistant",
                    "content": None,
                    "tool_calls": [
                        {
                            "id": cid,
                            "type": "function",
                            "function": {
                                "name": name,
                                "arguments": json.dumps(arguments),
                            },
                        }
                    ],
                }
            }
        ]
    }


def _content_reply(text: str) -> dict:
    return {"choices": [{"message": {"role": "assistant", "content": text}}]}


class FakeTransport:
    """Scripted endpoint: records payloads, pops replies in order."""

    def __init__(self, replies: list[dict]) -> None:
        self.replies = list(replies)
        self.payloads: list[dict] = []

    def __call__(self, payload: dict) -> dict:
        self.payloads.append(payload)
        return self.replies.pop(0)


def test_request_wire_shape():
    t = FakeTransport([_content_reply("hi")])
    policy = ChatCompletionsPolicy(t)
    out = policy([{"role": "system", "content": "sys"},
                  {"role": "user", "content": "q?"}])
    assert out == {"content": "hi"}
    (p,) = t.payloads
    # the reference's exact call surface (agent.py:146-152)
    assert p["model"] == DEFAULT_MODEL
    assert p["tool_choice"] == "auto"
    assert p["max_tokens"] == DEFAULT_MAX_TOKENS
    assert p["messages"] == [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "q?"},
    ]
    assert [tl["function"]["name"] for tl in p["tools"]] == [
        "search_papers",
        "get_paper_details",
        "search_knowledge_graph",
        "summarize_context",
    ]
    for tl in p["tools"]:
        assert tl["type"] == "function"
        fn = tl["function"]
        assert fn["parameters"]["type"] == "object"
        assert set(fn) == {"name", "description", "parameters"}


def test_tool_call_response_parses_arguments():
    t = FakeTransport(
        [_tool_call_reply("search_papers", {"query": "spark joins", "top_k": 3})]
    )
    out = ChatCompletionsPolicy(t)([{"role": "user", "content": "q"}])
    assert out["tool_calls"] == [
        {"name": "search_papers", "arguments": {"query": "spark joins", "top_k": 3}}
    ]


def test_internal_transcript_round_trips_to_wire():
    """Assistant tool_calls serialize with synthesized ids + JSON-string
    arguments; tool results carry the positionally matching
    tool_call_id (agent.py:156-170, 193-197)."""
    t = FakeTransport([_content_reply("done")])
    policy = ChatCompletionsPolicy(t)
    internal = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "q"},
        {
            "role": "assistant",
            "content": "",
            "tool_calls": [
                {"name": "search_papers", "arguments": {"query": "q", "top_k": 5}},
                {"name": "get_paper_details", "arguments": {"paper_id": "p1"}},
            ],
        },
        {"role": "tool", "content": "[]"},
        {"role": "tool", "content": "{}"},
    ]
    policy(internal)
    (p,) = t.payloads
    asst = p["messages"][2]
    assert [tc["type"] for tc in asst["tool_calls"]] == ["function", "function"]
    ids = [tc["id"] for tc in asst["tool_calls"]]
    assert len(set(ids)) == 2
    for tc in asst["tool_calls"]:
        # arguments must be a JSON STRING on the wire, not a dict
        assert isinstance(tc["function"]["arguments"], str)
        json.loads(tc["function"]["arguments"])
    tool_msgs = p["messages"][3:5]
    assert [m["tool_call_id"] for m in tool_msgs] == ids
    assert [m["role"] for m in tool_msgs] == ["tool", "tool"]


def test_agent_loop_with_scripted_endpoint(spark, sf_dir):
    """End to end: ResearchAgent driven by the adapter over a scripted
    endpoint walks search_papers -> summarize_context and returns the
    reference's result contract."""
    from cs_5542_lab_6_spark.agent_loop import ResearchAgent

    t = FakeTransport(
        [
            _tool_call_reply("search_papers", {"query": "spark shuffle", "top_k": 3}),
            _tool_call_reply("summarize_context", {"question": "spark shuffle"}),
            _content_reply("final"),
        ]
    )
    agent = ResearchAgent(spark, sf_dir, policy=ChatCompletionsPolicy(t))
    out = agent.run("spark shuffle")
    assert out["tools_used"][:2] == ["search_papers", "summarize_context"]
    assert out["citations"] and all("chunk_id" in c for c in out["citations"])
    assert out["answer"]
    # second round's payload must replay the tool transcript in wire form
    second = t.payloads[1]["messages"]
    assert second[-1]["role"] == "tool" and "tool_call_id" in second[-1]
    assert second[-2]["role"] == "assistant"
    assert (
        second[-2]["tool_calls"][0]["function"]["name"] == "search_papers"
    )


def test_env_gate(monkeypatch):
    monkeypatch.delenv(LLM_ENDPOINT_ENV, raising=False)
    assert policy_from_env() is None
    monkeypatch.setenv(LLM_ENDPOINT_ENV, "http://localhost:9/v1")
    monkeypatch.setenv(LLM_MODEL_ENV, "test-model")
    policy = policy_from_env()
    assert isinstance(policy, ChatCompletionsPolicy)
    assert policy.model == "test-model"
    # injected transport wins even without the env (test seam)
    monkeypatch.delenv(LLM_ENDPOINT_ENV, raising=False)
    t = FakeTransport([_content_reply("x")])
    assert isinstance(policy_from_env(t), ChatCompletionsPolicy)


def test_schema_parity_with_reference_names():
    """The four tools and their required arguments match the reference's
    TOOL_SCHEMAS (tool_schemas.py:11-103)."""
    required = {
        s["name"]: s["parameters"].get("required", []) for s in TOOL_SCHEMAS
    }
    assert required == {
        "search_papers": ["query"],
        "get_paper_details": ["paper_id"],
        "search_knowledge_graph": ["entities"],
        "summarize_context": ["question"],
    }


def test_orphan_tool_turns_get_unique_ids():
    """Consecutive tool turns with no preceding assistant tool_calls each
    synthesize a FRESH tool_call_id (r10 advice: a shared fallback id
    broke the uniqueness contract)."""
    t = FakeTransport([_content_reply("ok")])
    policy = ChatCompletionsPolicy(t)
    policy(
        [
            {"role": "user", "content": "q"},
            {"role": "tool", "content": "orphan one"},
            {"role": "tool", "content": "orphan two"},
        ]
    )
    (p,) = t.payloads
    ids = [m["tool_call_id"] for m in p["messages"] if m["role"] == "tool"]
    assert len(ids) == len(set(ids)) == 2


def test_malformed_tool_arguments_degrade_to_empty_dict():
    """A model emitting broken JSON for function arguments must not crash
    the agent loop mid-conversation (r10 advice) — the call surfaces with
    {} arguments and the dispatcher's own error handling takes over."""
    reply = _tool_call_reply("search_papers", {})
    reply["choices"][0]["message"]["tool_calls"][0]["function"]["arguments"] = (
        '{"query": unquoted oops'
    )
    out = ChatCompletionsPolicy(FakeTransport([reply]))(
        [{"role": "user", "content": "q"}]
    )
    assert out["tool_calls"][0]["arguments"] == {}
