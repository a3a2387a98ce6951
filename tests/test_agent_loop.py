"""Agent dispatch loop semantics (reference agent.py:127-228): iteration
cap, message-history accumulation, KG→vector fallback order, forced
summarize, and the no-answer fallback — exercised with injected
deterministic policies so every trajectory is pinned without an LLM."""

from __future__ import annotations

import pytest

from cs_5542_lab_6_spark.agent_loop import (
    MAX_ITERATIONS,
    NO_ANSWER_FALLBACK,
    ResearchAgent,
)

QUESTION = "distributed join performance"


@pytest.fixture(scope="module")
def agent(spark, sf_dir):
    return ResearchAgent(spark, sf_dir)


def test_default_policy_replays_mandated_sequence(agent):
    """STEP 1 search_papers → STEP 2 summarize_context → answer
    (agent.py:17-29's forced trajectory)."""
    agent.reset_history()
    out = agent.run(QUESTION)
    assert out["tools_used"][:2] == ["search_papers", "summarize_context"]
    assert out["citations"], "vector search must cite chunks"
    assert len(out["citations"]) <= 5  # agent.py:209-211 cap
    assert QUESTION in out["answer"]
    assert out["steps"] >= 2
    assert out["latency_ms"] >= 0


def test_history_accumulates_and_resets(agent):
    """Each run appends the user/assistant pair (agent.py:216-217);
    reset_history clears it (agent.py:230-231)."""
    agent.reset_history()
    agent.run("first question")
    agent.run("second question")
    assert [m["role"] for m in agent.history] == [
        "user",
        "assistant",
        "user",
        "assistant",
    ]
    assert agent.history[0]["content"] == "first question"
    assert agent.history[2]["content"] == "second question"
    agent.reset_history()
    assert agent.history == []


def test_history_is_fed_back_into_messages(spark, sf_dir):
    """The next run's message list is seeded with prior history between
    the system prompt and the new question (agent.py:131-135)."""
    seen: list[list[dict]] = []

    def spy_policy(messages):
        seen.append([dict(m) for m in messages])
        return {"content": "stop"}

    a = ResearchAgent(spark, sf_dir, policy=spy_policy)
    a.run("q1")
    a.run("q2")
    roles = [m["role"] for m in seen[1]]
    assert roles == ["system", "user", "assistant", "user"]
    assert seen[1][1]["content"] == "q1"
    assert seen[1][3]["content"] == "q2"


def test_iteration_cap(spark, sf_dir):
    """A policy that always wants another tool call is stopped at
    MAX_ITERATIONS (agent.py:32,142)."""
    calls = []

    def greedy_policy(messages):
        calls.append(1)
        return {
            "tool_calls": [{"name": "get_paper_details", "arguments": {"paper_id": "doc_1"}}]
        }

    a = ResearchAgent(spark, sf_dir, policy=greedy_policy)
    out = a.run(QUESTION)
    assert out["steps"] == MAX_ITERATIONS == 6
    assert len(calls) == MAX_ITERATIONS
    # no citations were collected and no summarize ran → fixed fallback
    # string (agent.py:213-214)
    assert out["answer"] == NO_ANSWER_FALLBACK


def test_kg_fallback_backfills_vector_citations(spark, sf_dir):
    """search_knowledge_graph with no prior citations triggers a vector
    search on the question so answers can still cite chunks — the
    KG→vector fallback order of agent.py:185-188."""

    def kg_first_policy(messages):
        called = [
            tc["name"]
            for m in messages
            if m["role"] == "assistant"
            for tc in m.get("tool_calls", ())
        ]
        if not called:
            return {
                "tool_calls": [
                    {
                        "name": "search_knowledge_graph",
                        "arguments": {"query": QUESTION, "top_k": 5},
                    }
                ]
            }
        return {"content": ""}

    a = ResearchAgent(spark, sf_dir, policy=kg_first_policy)
    out = a.run(QUESTION)
    assert out["tools_used"][0] == "search_knowledge_graph"
    # backfilled citations are chunk rows (chunk_id present), not KG rows
    assert out["citations"] and "chunk_id" in out["citations"][0]
    # citations exist → forced summarize appended (agent.py:204-211)
    assert out["tools_used"][-1] == "summarize_context"
    assert "A:" in out["answer"]


def test_forced_summarize_after_cap_exhaustion(spark, sf_dir):
    """A policy that searches but never summarizes still yields a
    summarized answer: the post-loop forced summarize (agent.py:204-211)."""

    def never_summarize(messages):
        return {
            "tool_calls": [
                {"name": "search_papers", "arguments": {"query": QUESTION, "top_k": 3}}
            ]
        }

    a = ResearchAgent(spark, sf_dir, policy=never_summarize)
    out = a.run(QUESTION)
    assert out["steps"] == MAX_ITERATIONS
    assert out["tools_used"].count("search_papers") == MAX_ITERATIONS
    assert out["tools_used"][-1] == "summarize_context"
    assert len(out["citations"]) <= 5
    assert "A:" in out["answer"]


def test_unknown_tool_returns_error_payload(spark, sf_dir):
    """Unknown tool name → {'error': ...} result, loop continues
    (agent.py:67-68); the run still terminates with the fallback."""

    def bad_tool_once(messages):
        if not any(m["role"] == "tool" for m in messages):
            return {"tool_calls": [{"name": "no_such_tool", "arguments": {}}]}
        return {"content": "done"}

    a = ResearchAgent(spark, sf_dir, policy=bad_tool_once)
    out = a.run(QUESTION)
    assert out["tools_used"] == ["no_such_tool"]
    assert out["answer"] == "done"
