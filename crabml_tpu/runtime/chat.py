"""Chat sessions: templates, stop-mark state machine, multi-turn KV reuse.

Functional equivalent of crabml-llama2/src/chat.rs: `ChatTemplate` covers the
four built-in formats with the same heuristic guess; `MarkMatcher` merges
multi-token stop marks streamed from the model; `ChatSession` keeps the KV
cache warm across turns (prefill resumes from the current cache length).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .runner import Runner


class ChatTemplate(Enum):
    LLAMA2 = "llama2"
    LLAMA3 = "llama3"
    CHATML = "chatml"
    GEMMA = "gemma"

    @staticmethod
    def heuristic_guess(model_name: str, architecture: str, chat_tmpl: str) -> "ChatTemplate":
        """Same guess order as chat.rs:201-218."""
        if "gemma" in model_name or architecture == "gemma":
            return ChatTemplate.GEMMA
        if "llama2" in model_name:
            return ChatTemplate.LLAMA2
        if "chatml" in chat_tmpl or "<|im_start|>" in chat_tmpl:
            return ChatTemplate.CHATML
        if "llama3" in model_name or "<|start_header_id|>" in chat_tmpl:
            return ChatTemplate.LLAMA3
        return ChatTemplate.LLAMA2

    @property
    def stop_mark(self) -> str:
        return {
            ChatTemplate.LLAMA2: "[/INST]",
            ChatTemplate.GEMMA: "<end_of_turn>",
            ChatTemplate.LLAMA3: "<|eot_id|>",
            ChatTemplate.CHATML: "<|im_end|>",
        }[self]

    def apply(
        self,
        prompt: str,
        system_prompt: str | None = None,
        append_assistant_prefix: bool = True,
    ) -> str:
        if self == ChatTemplate.LLAMA2:
            sys_p = f"<<SYS>>{system_prompt}<</SYS>>" if system_prompt else ""
            prefix = "[[INST]]" if append_assistant_prefix else ""
            return f"[INST] {sys_p} {prompt} [/INST]{prefix}"
        if self == ChatTemplate.LLAMA3:
            sys_p = (
                f"<|start_header_id|>system<|end_header_id|>\n\n{system_prompt}<|eot_id|>"
                if system_prompt
                else ""
            )
            prefix = (
                "<|start_header_id|>assistant<|end_header_id|>\n\n"
                if append_assistant_prefix
                else ""
            )
            return (
                f"{sys_p}<|start_header_id|>user<|end_header_id|>\n\n"
                f"{prompt}<|eot_id|>{prefix}"
            )
        if self == ChatTemplate.GEMMA:
            sys_p = system_prompt or ""
            prefix = "<start_of_turn>model\n" if append_assistant_prefix else ""
            return f"<start_of_turn>user\n{sys_p} {prompt}<end_of_turn>{prefix}"
        if self == ChatTemplate.CHATML:
            sys_p = (
                f"<|im_start|>system\n{system_prompt}<|im_end|>" if system_prompt else ""
            )
            prefix = "<|im_start|>assistant\n" if append_assistant_prefix else ""
            return f"{sys_p}<|im_start|>user\n{prompt}<|im_end|>{prefix}"
        raise AssertionError(self)

    def apply_messages(
        self, messages: "list[dict]", add_generation_prompt: bool = True
    ) -> str:
        """Render a full OpenAI-style conversation in this format.

        Multi-turn generalization of `apply` (which renders one user
        turn): a leading system message folds into the first user turn
        the same way `apply(system_prompt=...)` does, assistant turns
        close with the format's turn-end mark, and the assistant prefix
        is appended once at the end when `add_generation_prompt`.
        """
        system = None
        turns: list[tuple[str, str]] = []  # (role, content), system folded out
        for m in messages:
            if m["role"] == "system":
                system = m["content"] if system is None else system + "\n" + m["content"]
            else:
                turns.append((m["role"], m["content"]))
        out = []
        first_user = True
        for role, content in turns:
            if role == "user":
                if self == ChatTemplate.LLAMA2:
                    sys_p = (
                        f"<<SYS>>{system}<</SYS>>" if system and first_user else ""
                    )
                    out.append(f"[INST] {sys_p} {content} [/INST]")
                elif self == ChatTemplate.LLAMA3:
                    if system and first_user:
                        out.append(
                            "<|start_header_id|>system<|end_header_id|>\n\n"
                            f"{system}<|eot_id|>"
                        )
                    out.append(
                        "<|start_header_id|>user<|end_header_id|>\n\n"
                        f"{content}<|eot_id|>"
                    )
                elif self == ChatTemplate.GEMMA:
                    sys_p = f"{system} " if system and first_user else ""
                    out.append(
                        f"<start_of_turn>user\n{sys_p}{content}<end_of_turn>"
                    )
                elif self == ChatTemplate.CHATML:
                    if system and first_user:
                        out.append(f"<|im_start|>system\n{system}<|im_end|>")
                    out.append(f"<|im_start|>user\n{content}<|im_end|>")
                first_user = False
            else:  # assistant
                if self == ChatTemplate.LLAMA2:
                    out.append(f" {content} ")
                elif self == ChatTemplate.LLAMA3:
                    out.append(
                        "<|start_header_id|>assistant<|end_header_id|>\n\n"
                        f"{content}<|eot_id|>"
                    )
                elif self == ChatTemplate.GEMMA:
                    out.append(f"<start_of_turn>model\n{content}<end_of_turn>")
                elif self == ChatTemplate.CHATML:
                    out.append(f"<|im_start|>assistant\n{content}<|im_end|>")
        if add_generation_prompt:
            if self == ChatTemplate.LLAMA3:
                out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
            elif self == ChatTemplate.GEMMA:
                out.append("<start_of_turn>model\n")
            elif self == ChatTemplate.CHATML:
                out.append("<|im_start|>assistant\n")
            # LLAMA2: generation continues right after [/INST]
        return "".join(out)


def render_messages(
    cfg,
    messages: "list[dict]",
    tokenizer=None,
    add_generation_prompt: bool = True,
) -> "tuple[str, str]":
    """Render OpenAI-style `messages` to (prompt_text, stop_mark).

    When the GGUF carries `tokenizer.chat_template` (the HF Jinja
    template the converter passes through — tools/convert_hf.py), it is
    rendered exactly, in a sandboxed Jinja environment with the same
    variables `transformers.apply_chat_template` provides (`messages`,
    `add_generation_prompt`, `bos_token`, `eos_token`). Otherwise the
    built-in four-format heuristic renders the conversation
    (chat.rs:201-218 parity — the reference only has the heuristic).

    The returned stop mark is the template family's turn-end string; the
    caller passes it as a stop sequence so replies end at the turn
    boundary even when the turn-end token differs from the model EOS
    (llama3's <|eot_id|>, chatml's <|im_end|>).
    """
    for m in messages:
        if not isinstance(m, dict) or not isinstance(m.get("content"), str):
            raise ValueError("messages must be [{'role': .., 'content': str}]")
        if m.get("role") not in ("system", "user", "assistant"):
            raise ValueError(f"unsupported message role: {m.get('role')!r}")
    tmpl = ChatTemplate.heuristic_guess(
        cfg.model_name, cfg.architecture, cfg.chat_template
    )
    if cfg.chat_template:
        from jinja2.sandbox import ImmutableSandboxedEnvironment

        def raise_exception(msg):  # HF template helper
            raise ValueError(f"chat template error: {msg}")

        env = ImmutableSandboxedEnvironment(trim_blocks=True, lstrip_blocks=True)
        env.globals["raise_exception"] = raise_exception
        tok_str = (
            (lambda i: tokenizer.tokens[i] if 0 <= i < len(tokenizer.tokens) else "")
            if tokenizer is not None and getattr(tokenizer, "tokens", None)
            else (lambda i: "")
        )
        text = env.from_string(cfg.chat_template).render(
            messages=messages,
            add_generation_prompt=add_generation_prompt,
            bos_token=tok_str(tokenizer.bos_token) if tokenizer else "",
            eos_token=tok_str(tokenizer.eos_token) if tokenizer else "",
        )
        return text, tmpl.stop_mark
    return tmpl.apply_messages(messages, add_generation_prompt), tmpl.stop_mark


class MarkMatcher:
    """Streams tokens, merging multi-token stop marks (chat.rs:127-186)."""

    def __init__(self, marks: list[str]):
        self.marks = marks
        self.buf = ""
        self.active = False

    def push(self, token: str) -> str | None:
        if not self.active:
            if token in self.marks:
                return token
            if any(m.startswith(token) for m in self.marks):
                self.active = True
                self.buf = token
                return None
            return token
        self.buf += token
        if self.buf in self.marks:
            self.active = False
            return self.buf
        if not any(m.startswith(self.buf) for m in self.marks):
            self.active = False
            return self.buf
        return None


@dataclass
class ChatSession:
    """Multi-turn chat on a persistent KV cache (chat.rs:15-58)."""

    runner: Runner
    system_prompt: str | None = None
    template: ChatTemplate | None = None
    _has_stop_mark: bool = field(default=False, init=False)

    def __post_init__(self):
        if self.template is None:
            cfg = self.runner.cfg
            self.template = ChatTemplate.heuristic_guess(
                cfg.model_name, cfg.architecture, cfg.chat_template
            )

    def reply(self, prompt: str, max_tokens: int | None = None):
        """Yields reply text pieces; stops at the template stop mark, EOS,
        or `max_tokens`.

        Context overflow policy: when the KV cache can't fit the new turn,
        the session restarts — cache reset, system prompt re-applied, and
        the new turn prefilled fresh (earlier turns are dropped). The
        reference silently overflows instead (its grow-by-concat cache
        errors at seq_len, chat.rs has no handling); an explicit restart
        keeps long-running REPLs alive."""
        fresh = self.runner.kv_cache_len() == 0
        templated = self.template.apply(
            prompt,
            self.system_prompt if fresh else None,
            append_assistant_prefix=True,
        )
        try:
            _, _, token = self.runner.prefill(templated, bos=fresh)
        except ValueError:  # cache full: restart the session with this turn
            self.runner.reset()
            templated = self.template.apply(
                prompt, self.system_prompt, append_assistant_prefix=True
            )
            _, _, token = self.runner.prefill(templated, bos=True)
        matcher = MarkMatcher([self.template.stop_mark])
        self._has_stop_mark = False
        for piece in self.runner.generate(token, steps=max_tokens):
            merged = matcher.push(piece)
            if merged is None:
                continue
            if merged == self.template.stop_mark:
                self._has_stop_mark = True
                return
            yield merged

    def finish(self):
        """Append the stop mark to the cache if the model never emitted it
        (chat.rs:51-58), keeping the transcript well-formed for next turn."""
        if not self._has_stop_mark:
            try:
                self.runner.prefill(self.template.stop_mark, bos=False)
            except ValueError:
                pass  # cache full — next reply() restarts the session anyway
