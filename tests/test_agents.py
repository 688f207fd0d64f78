"""Agent layer tests with a fake LLM provider (no network)."""

import json

import numpy as np
import pytest
from PIL import Image

from intelligent_video_analysis_retrieval_system_tpu.agents import (
    LLMConfig,
    LLMProcessor,
    get_agent_tools,
)
from intelligent_video_analysis_retrieval_system_tpu.agents.tools import (
    to_openai_tools,
)
from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
from intelligent_video_analysis_retrieval_system_tpu.system import (
    CLIPEmbedder,
    EnhancedRetrievalSystem,
)
from intelligent_video_analysis_retrieval_system_tpu.utils.config import Config


@pytest.fixture(scope="module")
def agent_system(tmp_path_factory):
    root = tmp_path_factory.mktemp("agents")
    rng = np.random.default_rng(4)
    folder = root / "keyframes" / "vid0"
    folder.mkdir(parents=True)
    for n in range(5):
        arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
        Image.fromarray(arr).save(folder / f"{n}.jpg", quality=95)
    cfg = Config(config_file=None, base_dir=root, create_dirs=True,
                 overrides={"index": {"dtype": "float32", "thumbnail_size": 32}})
    system = EnhancedRetrievalSystem(
        cfg, embedder=CLIPEmbedder(config=CLIPConfig.tiny_test(),
                                   compute_dtype="float32")
    )
    system.build_system(root / "keyframes")
    yield system
    system.cleanup()


class TestTools:
    def test_tool_registry(self, agent_system):
        tools = get_agent_tools(agent_system)
        assert {t.name for t in tools} == {
            "search_keyframes", "analyze_keyframes", "get_system_status",
            "chat_about_frames",
        }
        oa = to_openai_tools(tools)
        assert oa[0]["type"] == "function"
        assert "parameters" in oa[0]["function"]

    def test_search_tool(self, agent_system):
        tools = {t.name: t for t in get_agent_tools(agent_system)}
        out = tools["search_keyframes"](query="a scene", limit=3)
        assert out["count"] == 3
        assert out["results"][0]["similarity_score"] > -1

    def test_search_tool_coerces_bad_limit(self, agent_system):
        tools = {t.name: t for t in get_agent_tools(agent_system)}
        out = tools["search_keyframes"](query="x", limit="not a number")
        assert out["count"] <= 10  # fell back to default
        out = tools["search_keyframes"](query="x", limit=99999)
        assert out["count"] <= 50  # capped

    def test_analyze_tool(self, agent_system):
        tools = {t.name: t for t in get_agent_tools(agent_system)}
        out = tools["analyze_keyframes"](folder="vid0", image="2.jpg")
        assert out["frame_id"] == 2
        assert "1.jpg" in out["temporal_neighbors"]
        out = tools["analyze_keyframes"](folder="vid0", image="nope.jpg")
        assert "error" in out

    def test_status_tool(self, agent_system):
        tools = {t.name: t for t in get_agent_tools(agent_system)}
        out = tools["get_system_status"]()
        assert out["index_frames"] == 5

    def test_invoke_json_tolerant(self, agent_system):
        tools = {t.name: t for t in get_agent_tools(agent_system)}
        # valid JSON string args
        out = json.loads(tools["search_keyframes"].invoke_json(
            '{"query": "cat", "limit": 2}'))
        assert out["count"] == 2
        # raw string becomes the first required param
        out = json.loads(tools["search_keyframes"].invoke_json("a dog"))
        assert out["query"] == "a dog"
        # bad kwargs -> error envelope, not an exception
        out = json.loads(tools["analyze_keyframes"].invoke_json('{"x": 1}'))
        assert "error" in out


def make_fake_provider(script):
    """A complete_fn replaying scripted replies; records all message lists."""
    calls = []

    def complete(messages, tools=None):
        calls.append({"messages": messages, "tools": tools})
        return script[min(len(calls) - 1, len(script) - 1)]

    complete.calls = calls
    return complete


class TestLLMProcessor:
    def test_no_provider_falls_back_to_search(self, agent_system):
        proc = LLMProcessor(agent_system, complete_fn=None)
        assert not proc.available
        out = proc.chat_with_user("find a dark scene")
        assert out["method"] == "search"

    def test_tool_call_loop(self, agent_system):
        provider = make_fake_provider([
            {"content": None, "tool_calls": [
                {"id": "c1", "name": "search_keyframes",
                 "arguments": '{"query": "a scene", "limit": 2}'},
            ]},
            {"content": "I found 2 matching frames.", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.chat_with_user("what scenes are there?")
        assert out["method"] == "agent"
        assert out["tool_calls"] == ["search_keyframes"]
        assert len(out["search_results"]) == 2
        # the tool output was relayed back to the model
        roles = [m["role"] for m in provider.calls[1]["messages"]]
        assert "tool" in roles

    def test_unknown_tool_handled(self, agent_system):
        provider = make_fake_provider([
            {"content": None, "tool_calls": [
                {"id": "c1", "name": "not_a_tool", "arguments": "{}"},
            ]},
            {"content": "ok", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.chat_with_user("hi")
        assert out["method"] == "agent"

    def test_tool_round_limit(self, agent_system):
        looping = {"content": None, "tool_calls": [
            {"id": "c", "name": "get_system_status", "arguments": "{}"},
        ]}
        provider = make_fake_provider([looping])
        proc = LLMProcessor(agent_system, complete_fn=provider,
                            config=LLMConfig(max_tool_rounds=2))
        out = proc.chat_with_user("loop forever")
        assert out["method"] == "agent_truncated"
        assert len(out["tool_calls"]) == 2

    def test_provider_crash_degrades(self, agent_system):
        def boom(messages, tools=None):
            raise RuntimeError("provider down")

        proc = LLMProcessor(agent_system, complete_fn=boom)
        out = proc.chat_with_user("anything")
        assert out["method"] == "search"  # fell through the whole chain

    def test_timeout_degrades(self, agent_system):
        import time

        def slow(messages, tools=None):
            time.sleep(2.0)
            return {"content": "late", "tool_calls": None}

        proc = LLMProcessor(
            agent_system, complete_fn=slow,
            config=LLMConfig(timeout_base_s=0.2, timeout_per_image_s=0.0),
        )
        out = proc.chat_with_user("slow")
        assert out["method"] == "search"

    def test_frames_attached_as_images(self, agent_system):
        provider = make_fake_provider([
            {"content": "nice frames", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.chat_with_user(
            "describe these", [{"folder": "vid0", "image": "1.jpg"}]
        )
        assert out["method"] == "agent"
        user_msg = provider.calls[0]["messages"][-1]
        parts = user_msg["content"]
        assert isinstance(parts, list)
        assert any(p.get("type") == "image_url" for p in parts)
        assert parts[1]["image_url"]["url"].startswith("data:image/jpeg;base64,")

    def test_session_clearing(self, agent_system):
        provider = make_fake_provider([{"content": "ok", "tool_calls": None}])
        proc = LLMProcessor(agent_system, complete_fn=provider,
                            config=LLMConfig(session_clear_every=2))
        proc.chat_with_user("one")
        assert proc._history
        proc.chat_with_user("two")  # run #2 clears first
        proc.chat_with_user("three")
        assert len(proc._history) <= 4

    def test_expand_query(self, agent_system):
        proc = LLMProcessor(agent_system, complete_fn=None)
        assert proc.expand_query("cat") == ["cat"]
        provider = make_fake_provider([
            {"content": "a photo of a cat\na cat sitting", "tool_calls": None},
        ])
        proc2 = LLMProcessor(agent_system, complete_fn=provider)
        out = proc2.expand_query("cat")
        assert out[0] == "cat" and len(out) == 3

    def test_explain_and_rank_shims(self, agent_system):
        proc = LLMProcessor(agent_system, complete_fn=None)
        results = [{"folder": "v", "image": "1.jpg", "similarity_score": 0.4}]
        assert proc.rank_results("q", results) == results
        assert "v/1.jpg" in proc.explain_results("q", results)
        assert "No keyframes" in proc.explain_results("q", [])

    def test_facade_enable_llm(self, agent_system):
        provider = make_fake_provider([
            {"content": "hello from agent", "tool_calls": None},
        ])
        proc = agent_system.enable_llm(complete_fn=provider)
        assert agent_system.llm_processor is proc
        out = agent_system.chat("tell me about the videos")
        assert out["response"] == "hello from agent"
        agent_system.llm_processor = None


class TestLLMErrorPaths:
    """Error paths from VERDICT r1 #10: malformed tool-call arguments JSON,
    a tool raising mid-loop, timeout during a tool call, degenerate
    provider reply shapes. None may raise to the caller (reference
    guarantee: search/chat never raise, system.py:821-826)."""

    def test_malformed_arguments_json_full_loop(self, agent_system):
        # truly unparseable arguments: tolerant parse maps the raw string
        # to the first required param; the loop continues to a final answer
        provider = make_fake_provider([
            {"content": None, "tool_calls": [
                {"id": "c1", "name": "search_keyframes",
                 "arguments": '{"query": "a scene", "limit": NOT_JSON}'},
            ]},
            {"content": "done", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.chat_with_user("find scenes")
        assert out["method"] == "agent"
        assert out["tool_calls"] == ["search_keyframes"]
        # the tool message relayed to the model is valid JSON (never a
        # stack trace)
        tool_msgs = [m for m in provider.calls[1]["messages"]
                     if m["role"] == "tool"]
        assert tool_msgs and json.loads(tool_msgs[0]["content"]) is not None

    def test_arguments_wrong_types_returns_error_payload(self, agent_system):
        provider = make_fake_provider([
            {"content": None, "tool_calls": [
                {"id": "c1", "name": "search_keyframes",
                 "arguments": json.dumps({"bogus_kwarg": 1})},
            ]},
            {"content": "ok", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.chat_with_user("hi")
        assert out["method"] == "agent"
        tool_msgs = [m for m in provider.calls[1]["messages"]
                     if m["role"] == "tool"]
        payload = json.loads(tool_msgs[0]["content"])
        assert "error" in payload

    def test_tool_raising_mid_loop_continues(self, agent_system, monkeypatch):
        proc = LLMProcessor(agent_system, complete_fn=make_fake_provider([
            {"content": None, "tool_calls": [
                {"id": "c1", "name": "get_system_status", "arguments": "{}"},
            ]},
            {"content": "recovered", "tool_calls": None},
        ]))

        def boom(**kwargs):
            raise RuntimeError("index exploded")

        monkeypatch.setattr(proc._tools_by_name["get_system_status"], "fn", boom)
        out = proc.chat_with_user("status?")
        # the exception became an {"error": ...} tool message; the loop
        # finished normally
        assert out["method"] == "agent"
        assert out["response"] == "recovered"

    def test_timeout_mid_tool_degrades(self, agent_system, monkeypatch):
        import time as _time

        calls = {"n": 0}

        def provider(messages, tools=None):
            calls["n"] += 1
            if tools is not None:  # agent pass: request the slow tool
                return {"content": None, "tool_calls": [
                    {"id": "c1", "name": "get_system_status",
                     "arguments": "{}"},
                ]}
            return {"content": "toolless answer", "tool_calls": None}

        def slow_tool(**kwargs):
            _time.sleep(5.0)
            return {"status": "late"}

        proc = LLMProcessor(
            agent_system, complete_fn=provider,
            config=LLMConfig(timeout_base_s=0.3, timeout_per_image_s=0.0),
        )
        monkeypatch.setattr(
            proc._tools_by_name["get_system_status"], "fn", slow_tool
        )
        out = proc.chat_with_user("status?")
        # agent pass timed out INSIDE the tool -> toolless fallback answered
        assert out["method"] == "toolless"
        assert out["response"] == "toolless answer"

    def test_provider_returns_garbage_shape(self, agent_system):
        # missing keys entirely: degradation chain must absorb it
        proc = LLMProcessor(
            agent_system,
            complete_fn=make_fake_provider([{"unexpected": "shape"}]),
        )
        out = proc.chat_with_user("hello")
        assert "response" in out and out["method"] in ("agent", "toolless")

    def test_tool_call_missing_name_key_degrades(self, agent_system):
        # provider emits a structurally-broken tool call (no "name"):
        # the agent pass raises internally, the chain falls back, and the
        # caller still gets an answer
        proc = LLMProcessor(
            agent_system,
            complete_fn=make_fake_provider([
                {"content": None, "tool_calls": [{"id": "c1"}]},
                {"content": "fallback ok", "tool_calls": None},
            ]),
        )
        out = proc.chat_with_user("hello")
        assert out["method"] in ("toolless", "search")

    def test_session_clear_boundary_drops_history(self, agent_system):
        provider = make_fake_provider([{"content": "a", "tool_calls": None}])
        proc = LLMProcessor(
            agent_system, complete_fn=provider,
            config=LLMConfig(session_clear_every=2, history_turns=4),
        )
        proc.chat_with_user("turn one")
        # second run hits the clear boundary: history must be empty BEFORE
        # the request is built (reference clears every N runs,
        # core.py:2300-2308)
        proc.chat_with_user("turn two")
        msgs = provider.calls[-1]["messages"]
        assert [m["role"] for m in msgs] == ["system", "user"]
        assert msgs[-1]["content"] == "turn two"
        # after a clear, the next turn carries the post-clear history only
        proc.chat_with_user("turn three")
        msgs = provider.calls[-1]["messages"]
        user_texts = [m["content"] for m in msgs if m["role"] == "user"]
        assert "turn one" not in user_texts


class TestVisionAnalysis:
    def test_offline_metadata_fallback(self, agent_system):
        proc = LLMProcessor(agent_system, complete_fn=None)
        out = proc.analyze_frames_vision(
            [{"folder": "vid0", "image": "1.jpg"}]
        )
        assert out["method"] == "metadata_fallback"
        assert "frame 1" in out["frames"][0]["description"]

    def test_structured_vision(self, agent_system):
        reply = {
            "content": json.dumps({
                "frames": [{"name": "vid0/1.jpg",
                            "description": "a colorful test pattern",
                            "objects": ["noise"], "scene": "synthetic"}],
                "summary": "one synthetic frame",
            }),
            "tool_calls": None,
        }
        provider = make_fake_provider([reply])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.analyze_frames_vision(
            [{"folder": "vid0", "image": "1.jpg"}], question="what is shown?"
        )
        assert out["method"] == "vision_structured"
        assert out["frames"][0]["objects"] == ["noise"]
        # the image was attached to the request
        content = provider.calls[0]["messages"][-1]["content"]
        assert any(p.get("type") == "image_url" for p in content)

    def test_unparseable_reply_degrades(self, agent_system):
        provider = make_fake_provider([
            {"content": "it is a picture of things", "tool_calls": None},
        ])
        proc = LLMProcessor(agent_system, complete_fn=provider)
        out = proc.analyze_frames_vision([{"folder": "vid0", "image": "1.jpg"}])
        assert out["method"] == "vision_unstructured"
        assert "picture" in out["summary"]


class TestAgentManager:
    def test_create_agent_with_tool_subset(self, agent_system, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        mgr = AgentManager(agent_system, db_path=tmp_path / "agents.db")
        agent = mgr.create_agent(
            "searcher", description="finds frames",
            tool_names=["search_keyframes"],
        )
        assert [t.name for t in agent.processor.tools] == ["search_keyframes"]
        listed = mgr.list_agents()
        assert listed[0]["name"] == "searcher"
        assert not listed[0]["online"]  # no provider configured

    def test_agent_run_persists_sessions(self, agent_system, tmp_path):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        mgr = AgentManager(agent_system, db_path=tmp_path / "agents.db")
        agent = mgr.create_agent("helper")
        out = agent.run("find a scene", session_id="s1")
        assert out["method"] == "search"  # offline fallback
        history = mgr.store.history("s1")
        assert history[0]["role"] == "user"
        assert history[1]["role"] == "assistant"
        assert mgr.store.sessions() == ["s1"]
        mgr.store.clear("s1")
        assert mgr.store.sessions() == []

    def test_system_prompt_persona_wrapped(self, agent_system):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        provider = make_fake_provider([
            {"content": "persona reply", "tool_calls": None},
        ])
        mgr = AgentManager(agent_system, complete_fn=provider)
        agent = mgr.create_agent("vn", system_prompt="Answer in Vietnamese.")
        out = agent.run("hello there friend")
        assert out["response"] == "persona reply"
        sys_msg = provider.calls[0]["messages"][0]
        assert sys_msg["content"].startswith("Answer in Vietnamese.")

    def test_sequential_team_chains_answers(self, agent_system):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        provider = make_fake_provider([
            {"content": "first answer", "tool_calls": None},
        ])
        mgr = AgentManager(agent_system, complete_fn=provider)
        mgr.create_agent("a")
        mgr.create_agent("b")
        team = mgr.create_team("duo", ["a", "b"])
        out = team.run("analyze the videos")
        assert len(out["responses"]) == 2
        # member b saw member a's answer in its task
        second_call_user = provider.calls[1]["messages"][-1]["content"]
        assert "first answer" in str(second_call_user)

    def test_parallel_team(self, agent_system):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        mgr = AgentManager(agent_system)  # offline agents
        mgr.create_agent("x")
        mgr.create_agent("y")
        team = mgr.create_team("pair", ["x", "y"], mode="parallel")
        out = team.run("find scenes")
        assert {r["agent"] for r in out["responses"]} == {"x", "y"}
        assert mgr.get_stats()["total_runs"] == 2

    def test_team_validation(self, agent_system):
        from intelligent_video_analysis_retrieval_system_tpu.agents import (
            AgentManager,
        )

        mgr = AgentManager(agent_system)
        with pytest.raises(KeyError):
            mgr.create_team("ghost", ["nope"])
        mgr.create_agent("a")
        with pytest.raises(ValueError):
            mgr.create_team("bad", ["a"], mode="circular")
