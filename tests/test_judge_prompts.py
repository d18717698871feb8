"""Judge prompts are metric definitions: every TAC/VAS/TAR prompt must be
byte-identical to the reference's (VERDICT r1 item 5 — a paraphrased rubric
silently redefines the published metric). These tests read the reference
sources directly and compare, so any drift fails loudly."""

import ast
from pathlib import Path

import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not available")


def _module_strings(path, names):
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (isinstance(t, ast.Name) and t.id in names
                        and isinstance(node.value, ast.Constant)):
                    out[t.id] = node.value.value
    return out


def _function_local_strings(path, func, names):
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Assign):
                    for t in sub.targets:
                        if (isinstance(t, ast.Name) and t.id in names
                                and isinstance(sub.value, ast.Constant)):
                            out[t.id] = sub.value.value
    return out


def test_vas_prompts_verbatim():
    from video_r2_tpu.evalharness import vas

    ref = _module_strings(REF / "eval/scripts/vas/evaluate_vas.py",
                          {"SYSTEM_PROMPT", "USER_TEMPLATE"})
    assert vas.SYSTEM_PROMPT == ref["SYSTEM_PROMPT"]
    assert vas.USER_TEMPLATE == ref["USER_TEMPLATE"]


def test_tar_extraction_prompts_verbatim():
    from video_r2_tpu.rewards import temporal

    ref = _function_local_strings(
        REF / "train/src/train/temporal_grounding_reward.py",
        "calculate_grounding_reward", {"SYSTEM", "USER_PROMPT"})
    assert temporal.EXTRACTION_SYSTEM == ref["SYSTEM"]
    assert temporal.EXTRACTION_USER == ref["USER_PROMPT"]


def test_tac_messages_verbatim():
    """The full built messages (system + user) match the reference builders
    for MCQ and open-form, with and without options."""
    import importlib.util

    from video_r2_tpu.evalharness import tac

    spec = importlib.util.spec_from_file_location(
        "ref_tac_utils", REF / "eval/scripts/tac/_utils.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    options = ["first option", "second one", "third"]
    for opts in (options, None):
        for text in ("The answer is B.", "", "  42.5  "):
            for is_mcq in (True, False):
                ref_msgs = ref.build_answer_parsing_message(opts, text, is_mcq)
                assert tac.ANSWER_PARSE_SYSTEM == ref_msgs[0]["content"]
                assert tac.answer_parse_user(opts, text, is_mcq) \
                    == ref_msgs[1]["content"]

    for text in ("I think it's C. Therefore, D.", ""):
        for is_mcq in (True, False):
            ref_msgs = ref.build_thinking_extraction_message(
                options, text, is_mcq)
            assert tac.THINK_EXTRACT_SYSTEM == ref_msgs[0]["content"]
            assert tac.think_extract_user(options, text, is_mcq) \
                == ref_msgs[1]["content"]


def test_tac_numeric_extraction_prompts_verbatim():
    """The NA-lens numeric extraction messages match the reference's
    build_extraction_message_numeric (tac/vsibench.py:168-179), rendered from
    its AST (the module itself imports vllm so it can't be imported here)."""
    from video_r2_tpu.evalharness import tac

    tree = ast.parse(open(REF / "eval/scripts/tac/vsibench.py").read())
    fn = next(n for n in ast.walk(tree)
              if isinstance(n, ast.FunctionDef)
              and n.name == "build_extraction_message_numeric")
    assigns = {t.id: a.value for a in ast.walk(fn)
               if isinstance(a, ast.Assign)
               for t in a.targets if isinstance(t, ast.Name)}

    def render(node, subs):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Add):
            return render(node.left, subs) + render(node.right, subs)
        return subs[ast.unparse(node)]

    assert tac.NUMERIC_EXTRACT_SYSTEM == render(assigns["sys_prompt"], {})
    for payload in ("the count is 7", "", "  3.5 meters  "):
        sub = payload.strip() if payload else ""
        ref_user = render(assigns["user"],
                          {"payload_text.strip() if payload_text else ''": sub})
        assert tac.numeric_extract_user(payload) == ref_user


def test_tar_consistency_prompt_verbatim():
    """The consistency auditor messages match reward_funcs.py:117-134: build
    them through our templates and compare with the reference's inline
    construction reproduced from its AST constants."""
    from video_r2_tpu.rewards import temporal

    src = open(REF / "train/src/train/reward_funcs.py").read()
    tree = ast.parse(src)
    sys_parts = user_parts = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "llm_score_instructions":
                    sys_parts = node.value
                if isinstance(t, ast.Name) and t.id == "user_msg":
                    user_parts = node.value
    assert sys_parts is not None and user_parts is not None

    def render(node, subs):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.JoinedStr):
            out = ""
            for v in node.values:
                if isinstance(v, ast.Constant):
                    out += v.value
                else:  # FormattedValue -> substitute by expression source
                    out += subs[ast.unparse(v.value)]
            return out
        if isinstance(node, ast.Tuple):
            return "".join(render(e, subs) for e in node.elts)
        raise AssertionError(f"unexpected node {node}")

    ref_system = render(sys_parts, {})
    assert temporal.CONSISTENCY_SYSTEM == ref_system

    q, think, answer = "What color?", "The car is red so A.", "A"
    subs = {
        "question.strip() if question else '(none)'": q,
        "reasoninig.strip() if reasoninig else '(missing)'": think,
        "answer.strip() if answer else '(missing)'": answer,
    }
    ref_user = render(user_parts, subs)
    ours = temporal.CONSISTENCY_USER.format(question=q, think=think,
                                            answer=answer)
    assert ours == ref_user
