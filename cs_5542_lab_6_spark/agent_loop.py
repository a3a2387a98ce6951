"""Iteration-capped agent dispatch loop (SURVEY §2.9 M9, reference
agent.py:127-228).

The reference's ``ResearchAgent.run`` drives an LLM tool-calling loop:
up to ``MAX_ITERATIONS=6`` chat turns (agent.py:32,142), a growing
message list seeded with system prompt + persisted history + the user
question (agent.py:131-135), per-tool-call dispatch with citation
accumulation (agent.py:156-197), a KG→vector fallback when graph search
returns without prior citations (agent.py:185-188), a forced
``summarize_context`` over collected citations after the loop
(agent.py:204-211), a fixed no-answer fallback string (agent.py:213-214),
and question/answer pairs appended to ``self.history`` (agent.py:216-217).

This module reproduces that loop *shape* exactly, with the one
deliberate substitution SURVEY §7.3 prescribes: the chat-completion call
is an injectable deterministic **policy** — a callable from the message
list to either tool calls or a final text — because the LLM itself is
outside the engine. The default policy replays the reference's mandated
STEP 1→2→3 sequence (agent.py:17-29): search_papers, then
summarize_context, then stop. Tests inject adversarial policies
(never-summarize, infinite-tool-calls, unknown tools) to pin the cap and
fallback semantics.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable

from pyspark.sql import SparkSession

from . import agent_api

MAX_ITERATIONS = 6  # agent.py:32
CITATION_CAP = agent_api.CITATION_CAP

# agent.py:17-29, condensed: the mandated tool sequence the default
# policy replays.
SYSTEM_PROMPT = (
    "You are a Research Assistant agent. STEP 1: search_papers with the "
    "question. STEP 2: summarize_context over the chunks. STEP 3: return "
    "the answer. Use get_paper_details / search_knowledge_graph as needed. "
    "Never answer from your own knowledge."
)

NO_ANSWER_FALLBACK = (
    "I was unable to find relevant information for your question."
)  # agent.py:214

# Policy protocol: messages -> {"tool_calls": [{"name", "arguments"}]}
# to keep looping, or {"content": str} to finish (the no-tool-call break
# branch, agent.py:199-202).
Policy = Callable[[list[dict]], dict[str, Any]]


def default_policy(messages: list[dict]) -> dict[str, Any]:
    """Deterministic stand-in for the chat completion: replays the
    system prompt's mandated sequence based on what the transcript
    already contains — exactly the trajectory the reference's prompt
    forces a compliant model through."""
    called = [
        tc["name"]
        for m in messages
        if m["role"] == "assistant"
        for tc in m.get("tool_calls", ())
    ]
    question = next(m["content"] for m in reversed(messages) if m["role"] == "user")
    if "search_papers" not in called:
        return {
            "tool_calls": [
                {"name": "search_papers", "arguments": {"query": question, "top_k": 5}}
            ]
        }
    if "summarize_context" not in called:
        # chunks intentionally omitted: the dispatcher fills in the last
        # citations, mirroring agent.py:84-85
        return {
            "tool_calls": [
                {"name": "summarize_context", "arguments": {"question": question}}
            ]
        }
    last_tool = next(
        (m["content"] for m in reversed(messages) if m["role"] == "tool"), ""
    )
    return {"content": json.loads(last_tool) if last_tool else ""}


class ResearchAgent:
    """The reference agent's loop machinery over the engine's tool
    surface (agent_api), LLM replaced by an injectable policy."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        policy: Policy | None = None,
    ) -> None:
        from .llm_policy import policy_from_env

        self.spark = spark
        self.sf_dir = sf_dir
        # precedence: explicit injection > $SPARK_GRAFT_LLM_ENDPOINT
        # (real chat-completions adapter, llm_policy.py) > deterministic
        # replay — the same gate order as the embedder/reranker seams.
        self.policy = policy or policy_from_env() or default_policy
        self.history: list[dict] = []  # agent.py:42
        self._last_citations: list[dict] = []  # agent.py:46

    # -- tool dispatch (agent.py:65-92) ---------------------------------

    def _call_tool(self, name: str, args: dict) -> Any:
        if name == "search_papers":
            rows = agent_api.search_papers(
                self.spark,
                self.sf_dir,
                args.get("query", ""),
                int(args.get("top_k", agent_api.DEFAULT_TOP_K)),
            ).collect()
            return [r.asDict() for r in rows]
        if name == "get_paper_details":
            rows = agent_api.get_paper_details(
                self.spark, self.sf_dir, args.get("paper_id", "")
            ).collect()
            return [r.asDict() for r in rows]
        if name == "search_knowledge_graph":
            entities = args.get("entities") or str(args.get("query", "")).split()
            rows = agent_api.search_knowledge_graph(
                self.spark, self.sf_dir, entities, int(args.get("top_k", 10))
            ).collect()
            return [r.asDict() for r in rows]
        if name == "summarize_context":
            # argument aliasing + last-citations fill-in, agent.py:79-86
            question = args.get("question") or args.get("q", "")
            chunks = args.get("chunks") or args.get("c") or self._last_citations
            return agent_api.summarize_context(question, chunks)
        return {"error": f"Unknown tool: {name}"}  # agent.py:67-68

    # -- the loop (agent.py:127-228) ------------------------------------

    def run(self, question: str) -> dict[str, Any]:
        start = time.time()
        messages: list[dict] = [
            {"role": "system", "content": SYSTEM_PROMPT},
            *self.history,
            {"role": "user", "content": question},
        ]
        tools_used: list[str] = []
        citations: list[dict] = []
        answer = ""
        steps = 0

        for _ in range(MAX_ITERATIONS):
            steps += 1
            decision = self.policy(messages)
            tool_calls = decision.get("tool_calls")
            if not tool_calls:
                # no-tool-call turn: take the content as the answer and
                # break (agent.py:199-202)
                if decision.get("content"):
                    answer = str(decision["content"])
                break

            messages.append(
                {
                    "role": "assistant",
                    "content": decision.get("content", ""),
                    "tool_calls": [
                        {"name": tc["name"], "arguments": tc.get("arguments", {})}
                        for tc in tool_calls
                    ],
                }
            )
            for tc in tool_calls:
                name = tc["name"]
                tools_used.append(name)
                result = self._call_tool(name, tc.get("arguments", {}))

                if name == "search_papers" and isinstance(result, list):
                    citations.extend(c for c in result if "error" not in c)
                    self._last_citations = citations  # agent.py:179-183

                if name == "search_knowledge_graph" and not citations:
                    # KG→vector fallback: graph hits alone cannot cite
                    # chunks, so vector-search the question (agent.py:185-188)
                    extra = self._call_tool(
                        "search_papers", {"query": question, "top_k": 5}
                    )
                    citations.extend(c for c in extra if "error" not in c)
                    self._last_citations = citations

                if name == "summarize_context" and isinstance(result, str):
                    answer = result

                messages.append(
                    {"role": "tool", "content": json.dumps(result, default=str)}
                )

        if citations:
            # forced summarize over the collected citations — runs even
            # when the loop exhausted its cap without answering
            # (agent.py:204-211)
            if "summarize_context" not in tools_used:
                tools_used.append("summarize_context")
            answer = agent_api.summarize_context(question, citations[:CITATION_CAP])

        if not answer:
            answer = NO_ANSWER_FALLBACK

        self.history.append({"role": "user", "content": question})
        self.history.append({"role": "assistant", "content": answer})

        return {
            "answer": answer,
            "citations": citations[:CITATION_CAP],
            "tools_used": tools_used,
            "steps": steps,
            "latency_ms": int((time.time() - start) * 1000),
        }

    def reset_history(self) -> None:
        self.history = []  # agent.py:230-231
