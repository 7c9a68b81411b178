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
    """Multi-turn chat on a persistent KV cache (chat.rs:15-58).

    When the GGUF carries `tokenizer.chat_template` (and no explicit
    `template` override is given), turns render through the model's own
    Jinja template incrementally: each turn re-renders the full message
    list and prefills only the suffix past what the cache already holds,
    so multi-turn cost stays proportional to the new turn. Known
    tolerance: suffix tokenization can differ at the splice boundary
    from whole-text tokenization (every incremental chat implementation
    shares this); a template that rewrites earlier turns (not
    append-only) triggers a clean session restart instead of drifting.
    """

    runner: Runner
    system_prompt: str | None = None
    template: ChatTemplate | None = None
    _has_stop_mark: bool = field(default=False, init=False)
    messages: list = field(default_factory=list, init=False)
    _rendered: str = field(default="", init=False)

    def __post_init__(self):
        cfg = self.runner.cfg
        self._jinja = self.template is None and bool(cfg.chat_template)
        if self.template is None:
            self.template = ChatTemplate.heuristic_guess(
                cfg.model_name, cfg.architecture, cfg.chat_template
            )

    def _render(self, add_generation_prompt: bool) -> "tuple[str, str]":
        """Render self.messages via the GGUF template, minus any leading
        bos text (prefill adds the bos id itself — avoids a double bos
        when the template opens with {{ bos_token }})."""
        tok = self.runner.tokenizer
        text, stop = render_messages(
            self.runner.cfg, self.messages, tok,
            add_generation_prompt=add_generation_prompt,
        )
        bos_str = (
            tok.tokens[tok.bos_token]
            if tok is not None and 0 <= tok.bos_token < len(tok.tokens)
            else ""
        )
        if bos_str and text.startswith(bos_str):
            text = text[len(bos_str):]
        return text, stop

    def _reply_jinja(self, prompt: str, max_tokens: int | None):
        if self.runner.kv_cache_len() == 0:
            self.messages = []
            self._rendered = ""
            if self.system_prompt:
                self.messages.append(
                    {"role": "system", "content": self.system_prompt}
                )
        self.messages.append({"role": "user", "content": prompt})
        full, stop_mark = self._render(add_generation_prompt=True)
        if self._rendered and not full.startswith(self._rendered):
            self.runner.reset()  # template rewrote history: restart clean
            self._rendered = ""
        delta = full[len(self._rendered):]
        try:
            _, _, token = self.runner.prefill(
                delta, bos=self.runner.kv_cache_len() == 0
            )
        except ValueError:  # cache full: restart with system + this turn
            self.runner.reset()
            self._rendered = ""
            keep = [m for m in self.messages if m["role"] == "system"][:1]
            self.messages = keep + [self.messages[-1]]
            full, stop_mark = self._render(add_generation_prompt=True)
            _, _, token = self.runner.prefill(full, bos=True)
        matcher = MarkMatcher([stop_mark])
        self._has_stop_mark = False
        parts: list[str] = []
        for piece in self.runner.generate(token, steps=max_tokens):
            merged = matcher.push(piece)
            if merged is None:
                continue
            if merged == stop_mark:
                self._has_stop_mark = True
                break
            parts.append(merged)
            yield merged
        reply_text = "".join(parts)
        self.messages.append({"role": "assistant", "content": reply_text})
        # text the cache actually holds, incl. a buffered false-start
        cache_text = full + reply_text + (
            stop_mark if self._has_stop_mark else ""
        ) + (matcher.buf if matcher.active else "")
        closed, _ = self._render(add_generation_prompt=False)
        if closed.startswith(cache_text):
            tail = closed[len(cache_text):]
            if tail:
                try:  # close the turn exactly as the template writes it
                    self.runner.prefill(tail, bos=False)
                    self._has_stop_mark = True  # turn closed in-cache
                except ValueError:
                    self._rendered = cache_text
                    return
            self._rendered = closed
        else:
            # cache text diverged from the canonical render (template
            # normalizes the reply); next reply() detects and restarts
            self._rendered = cache_text

    def reply(self, prompt: str, max_tokens: int | None = None):
        """Yields reply text pieces; stops at the template stop mark, EOS,
        or `max_tokens`.

        Context overflow policy: when the KV cache can't fit the new turn,
        the session restarts — cache reset, system prompt re-applied, and
        the new turn prefilled fresh (earlier turns are dropped). The
        reference silently overflows instead (its grow-by-concat cache
        errors at seq_len, chat.rs has no handling); an explicit restart
        keeps long-running REPLs alive."""
        if self._jinja:
            yield from self._reply_jinja(prompt, max_tokens)
            return
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
        if self._jinja:
            return  # _reply_jinja closes each turn from the template render
        if not self._has_stop_mark:
            try:
                self.runner.prefill(self.template.stop_mark, bos=False)
            except ValueError:
                pass  # cache full — next reply() restarts the session anyway
