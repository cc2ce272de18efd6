"""The complete reference GST-Tacotron architecture as REAL tf.keras layers.

Purpose (VERDICT r2 #1; SURVEY.md §7 stage 10 / hard part 2): the reference
mount is empty, so the maximal demonstrable parity is against the reference
ARCHITECTURE rebuilt in actual TF/Keras — embedding -> prenet -> CBHG encoder
-> GST (reference encoder + style token layer) -> Bahdanau/LSA attention
decoder cell -> post-CBHG (SURVEY.md §2.1 component identities). This module
builds that model out of genuine `tf.keras` layers (TF 2.21 is in the image
for exactly this), runs a teacher-forced eager forward, and saves a real
`tf.train.Checkpoint` whose object-graph naming mirrors our flax param tree —
the export convention `tf_import.import_gst_tacotron` consumes.

Everything numerically meaningful runs through Keras kernels: GRU/GRUCell
(reset_after=True), Conv1D/Conv2D SAME, BatchNormalization (eps 1e-3),
Dense. Only the seq2seq glue (concat, softmax over scores, the decode loop)
is plain TF ops, exactly as a TF2 reference implementation would write it.
"""

from __future__ import annotations

import numpy as np
import tensorflow as tf


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


class KerasCBHG:
    """CBHG: conv bank (K widths, one fused BN) -> maxpool(2,1,SAME) ->
    conv3 projections + BN -> residual -> [pre-highway Dense] -> highways ->
    BiGRU. Mirrors models/modules.py::CBHG (reference Modules.py CBHG)."""

    def __init__(self, bank_k, bank_channels, proj_channels, highway_layers,
                 highway_dim, gru_dim, in_dim):
        self.bank_convs = [
            tf.keras.layers.Conv1D(bank_channels, k, padding="same",
                                   use_bias=False)
            for k in range(1, bank_k + 1)
        ]
        self.bank_bn = tf.keras.layers.BatchNormalization()
        self.pool = tf.keras.layers.MaxPool1D(2, strides=1, padding="same")
        self.projs = [
            tf.keras.layers.Conv1D(ch, 3, padding="same", use_bias=False)
            for ch in proj_channels
        ]
        self.proj_bns = [
            tf.keras.layers.BatchNormalization() for _ in proj_channels
        ]
        self.residual_proj = (
            tf.keras.layers.Dense(proj_channels[-1])
            if in_dim != proj_channels[-1] else None
        )
        self.pre_highway = (
            tf.keras.layers.Dense(highway_dim)
            if proj_channels[-1] != highway_dim else None
        )
        self.highways = [
            (tf.keras.layers.Dense(highway_dim),
             tf.keras.layers.Dense(highway_dim))
            for _ in range(highway_layers)
        ]
        self.gru_fwd = tf.keras.layers.GRU(gru_dim, reset_after=True,
                                           return_sequences=True)
        self.gru_bwd = tf.keras.layers.GRU(gru_dim, reset_after=True,
                                           return_sequences=True)

    def __call__(self, x):
        residual = x
        y = tf.concat([conv(x) for conv in self.bank_convs], axis=-1)
        y = tf.nn.relu(self.bank_bn(y, training=False))
        y = self.pool(y)
        for i, (proj, bn) in enumerate(zip(self.projs, self.proj_bns)):
            y = bn(proj(y), training=False)
            if i + 1 < len(self.projs):
                y = tf.nn.relu(y)
        if self.residual_proj is not None:
            residual = self.residual_proj(residual)
        y = y + residual
        if self.pre_highway is not None:
            y = self.pre_highway(y)
        for h_layer, t_layer in self.highways:
            h = tf.nn.relu(h_layer(y))
            t = tf.nn.sigmoid(t_layer(y))
            y = h * t + y * (1.0 - t)
        fwd = self.gru_fwd(y)
        bwd = tf.reverse(self.gru_bwd(tf.reverse(y, axis=[1])), axis=[1])
        return tf.concat([fwd, bwd], axis=-1)

    def trackables(self):
        t = {f"bank_conv_{k}": c for k, c in enumerate(self.bank_convs)}
        t["bank_bn"] = self.bank_bn
        t.update({f"proj_{i}": p for i, p in enumerate(self.projs)})
        t.update({f"proj_bn_{i}": b for i, b in enumerate(self.proj_bns)})
        if self.residual_proj is not None:
            t["residual_proj"] = self.residual_proj
        if self.pre_highway is not None:
            t["pre_highway"] = self.pre_highway
        for i, (h, tt) in enumerate(self.highways):
            t[f"highway_{i}_h"] = h
            t[f"highway_{i}_t"] = tt
        t["gru_fwd"] = self.gru_fwd
        t["gru_bwd"] = self.gru_bwd
        return t


class KerasGSTTacotron:
    """The full architecture, teacher-forced (SURVEY.md §3.2 Train_Step)."""

    def __init__(self, num_symbols, embedding_dim, enc_prenet_dims,
                 enc_cbhg, num_mels, num_freq, gst_conv_channels, gst_gru_dim,
                 gst_num_tokens, gst_num_heads, gst_style_dim,
                 attn_dim, dec_prenet_dims, attention_rnn_dim,
                 decoder_rnn_dim, num_decoder_rnns, reduction_factor,
                 post_cbhg, attention_kind="bahdanau",
                 location_filters=8, location_kernel_size=5,
                 cumulative=True):
        self.r = reduction_factor
        self.num_mels = num_mels
        self.attention_kind = attention_kind
        self.cumulative = cumulative
        # -- encoder
        self.embedding = tf.keras.layers.Embedding(num_symbols, embedding_dim)
        self.enc_prenet = [tf.keras.layers.Dense(d) for d in enc_prenet_dims]
        self.enc_cbhg = KerasCBHG(in_dim=enc_prenet_dims[-1], **enc_cbhg)
        # -- GST
        self.ref_convs = [
            tf.keras.layers.Conv2D(ch, 3, strides=2, padding="same",
                                   use_bias=False)
            for ch in gst_conv_channels
        ]
        self.ref_bns = [
            tf.keras.layers.BatchNormalization() for _ in gst_conv_channels
        ]
        self.ref_gru = tf.keras.layers.GRU(gst_gru_dim, reset_after=True)
        self.num_heads = gst_num_heads
        self.style_dim = gst_style_dim
        self.tokens = tf.Variable(
            np.random.default_rng(7).normal(
                0, 0.5, (gst_num_tokens, gst_style_dim // gst_num_heads)
            ).astype(np.float32),
            name="style_tokens",
        )
        self.stl_q = tf.keras.layers.Dense(gst_style_dim, use_bias=False)
        self.stl_k = tf.keras.layers.Dense(gst_style_dim, use_bias=False)
        self.stl_v = tf.keras.layers.Dense(gst_style_dim, use_bias=False)
        # -- decoder cell
        self.dec_prenet = [tf.keras.layers.Dense(d) for d in dec_prenet_dims]
        self.attention_rnn = tf.keras.layers.GRUCell(attention_rnn_dim,
                                                     reset_after=True)
        self.attn_query = tf.keras.layers.Dense(attn_dim, use_bias=False)
        self.attn_memory = tf.keras.layers.Dense(attn_dim, use_bias=False)
        self.attn_v = tf.keras.layers.Dense(1, use_bias=False)
        if attention_kind == "location_sensitive":
            self.loc_conv = tf.keras.layers.Conv1D(
                location_filters, location_kernel_size, padding="same",
                use_bias=False)
            self.loc_proj = tf.keras.layers.Dense(attn_dim, use_bias=False)
        self.dec_input_proj = tf.keras.layers.Dense(decoder_rnn_dim)
        self.dec_rnns = [
            tf.keras.layers.GRUCell(decoder_rnn_dim, reset_after=True)
            for _ in range(num_decoder_rnns)
        ]
        self.frame_proj = tf.keras.layers.Dense(reduction_factor * num_mels)
        self.stop_proj = tf.keras.layers.Dense(reduction_factor)
        # -- postnet
        self.post_cbhg = KerasCBHG(in_dim=num_mels, **post_cbhg)
        self.post_linear = tf.keras.layers.Dense(num_freq)

    # -- forward pieces -------------------------------------------------------

    def encode(self, tokens):
        x = self.embedding(tokens)
        for d in self.enc_prenet:
            x = tf.nn.relu(d(x))  # prenet dropout off (parity mode)
        return self.enc_cbhg(x)

    def style(self, ref_mel):
        x = ref_mel[..., None]
        for conv, bn in zip(self.ref_convs, self.ref_bns):
            x = tf.nn.relu(bn(conv(x), training=False))
        b, t = x.shape[0], x.shape[1]
        x = tf.reshape(x, (b, t, x.shape[2] * x.shape[3]))
        ref = self.ref_gru(x)  # (B, gst_gru_dim)
        keys_base = tf.tanh(self.tokens)
        head_dim = self.style_dim // self.num_heads
        q = tf.reshape(self.stl_q(ref), (-1, self.num_heads, head_dim))
        k = tf.reshape(self.stl_k(keys_base), (-1, self.num_heads, head_dim))
        v = tf.reshape(self.stl_v(keys_base), (-1, self.num_heads, head_dim))
        scores = tf.einsum("bhd,nhd->bhn", q, k) / np.sqrt(head_dim)
        attn = tf.nn.softmax(scores, axis=-1)
        return tf.reshape(tf.einsum("bhn,nhd->bhd", attn, v),
                          (-1, self.style_dim))

    def decode_teacher_forced(self, memory, mel_targets):
        b = int(memory.shape[0])
        t_mem = int(memory.shape[1])
        steps = int(mel_targets.shape[1]) // self.r
        keys = self.attn_memory(memory)
        context = tf.zeros((b, memory.shape[-1]))
        attn_h = tf.zeros((b, self.attention_rnn.units))
        dec_h = [tf.zeros((b, c.units)) for c in self.dec_rnns]
        # LSA state: previous alignment (delta on position 0) + cumulative
        alignment = tf.one_hot(tf.zeros((b,), tf.int32), t_mem)
        cumulative = tf.zeros((b, t_mem))
        last = tf.zeros((b, self.num_mels))
        frames_all, stops_all, aligns_all = [], [], []
        for s in range(steps):
            x = (last if s == 0
                 else mel_targets[:, s * self.r - 1, :])  # last of prev group
            for d in self.dec_prenet:
                x = tf.nn.relu(d(x))
            attn_in = tf.concat([x, context], axis=-1)
            query, [attn_h] = self.attention_rnn(attn_in, [attn_h])
            score_in = keys + self.attn_query(query)[:, None, :]
            if self.attention_kind == "location_sensitive":
                feats = tf.stack([alignment, cumulative], axis=-1)
                if not self.cumulative:
                    feats = feats[..., :1]
                score_in = score_in + self.loc_proj(self.loc_conv(feats))
            scores = tf.squeeze(self.attn_v(tf.tanh(score_in)), -1)
            alignment = tf.nn.softmax(scores, axis=-1)
            cumulative = cumulative + alignment
            context = tf.einsum("bt,btm->bm", alignment, memory)
            h = self.dec_input_proj(tf.concat([query, context], axis=-1))
            for i, cell in enumerate(self.dec_rnns):
                out, [dec_h[i]] = cell(h, [dec_h[i]])
                h = h + out
            proj_in = tf.concat([h, context], axis=-1)
            frames_all.append(self.frame_proj(proj_in))
            stops_all.append(self.stop_proj(proj_in))
            aligns_all.append(alignment)
        mel = tf.reshape(
            tf.concat([f[:, None] for f in frames_all], axis=1),
            (b, steps * self.r, self.num_mels))
        stops = tf.reshape(
            tf.concat([st[:, None] for st in stops_all], axis=1),
            (b, steps * self.r))
        aligns = tf.stack(aligns_all, axis=1)  # (B, S, T)
        return mel, stops, aligns

    def __call__(self, tokens, mel_targets, ref_mel):
        enc = self.encode(tokens)
        style = self.style(ref_mel)
        memory = tf.concat(
            [enc, tf.tile(style[:, None, :], (1, enc.shape[1], 1))], axis=-1)
        mel, stops, aligns = self.decode_teacher_forced(memory, mel_targets)
        linear = self.post_linear(self.post_cbhg(mel))
        return {"mel": mel.numpy(), "linear": linear.numpy(),
                "stop_logits": stops.numpy(), "alignments": aligns.numpy()}

    # -- checkpoint export ----------------------------------------------------

    def save_checkpoint(self, path_prefix) -> str:
        """Save under the export convention tf_import.import_gst_tacotron
        reads (object-graph names mirroring our flax tree)."""

        def ck(**kw):
            return tf.train.Checkpoint(**kw)

        enc = ck(embedding=self.embedding,
                 **{f"prenet_{i}": d for i, d in enumerate(self.enc_prenet)},
                 cbhg=ck(**self.enc_cbhg.trackables()))
        gst = ck(**{f"ref_conv_{i}": c for i, c in enumerate(self.ref_convs)},
                 **{f"ref_bn_{i}": b for i, b in enumerate(self.ref_bns)},
                 ref_gru=self.ref_gru, tokens=self.tokens,
                 stl_q=self.stl_q, stl_k=self.stl_k, stl_v=self.stl_v)
        dec = ck(**{f"prenet_{i}": d for i, d in enumerate(self.dec_prenet)},
                 attention_rnn=self.attention_rnn,
                 attn_query=self.attn_query, attn_memory=self.attn_memory,
                 attn_v=self.attn_v,
                 **({"loc_conv": self.loc_conv, "loc_proj": self.loc_proj}
                    if self.attention_kind == "location_sensitive" else {}),
                 dec_input_proj=self.dec_input_proj,
                 **{f"rnn_{i}": c for i, c in enumerate(self.dec_rnns)},
                 frame_proj=self.frame_proj, stop_proj=self.stop_proj)
        post = ck(cbhg=ck(**self.post_cbhg.trackables()),
                  linear=self.post_linear)
        root = tf.train.Checkpoint(encoder=enc, gst=gst, decoder=dec,
                                   postnet=post)
        return root.save(str(path_prefix))

    def randomize(self, rng: np.random.Generator, scale=0.3):
        """Assign nontrivial values to EVERY variable (biases included) so
        the parity test is sensitive to each parameter, and give the BNs
        non-identity moving statistics."""
        for layer in self._all_layers():
            for var in getattr(layer, "variables", []):
                name = getattr(var, "path", None) or var.name
                if "moving_variance" in name:
                    var.assign(rng.uniform(0.5, 2.0, var.shape).astype(np.float32))
                elif "moving_mean" in name:
                    var.assign(rng.normal(0, 0.3, var.shape).astype(np.float32))
                elif "gamma" in name:
                    var.assign(rng.uniform(0.7, 1.3, var.shape).astype(np.float32))
                else:
                    var.assign(rng.normal(0, scale, var.shape).astype(np.float32))
        self.tokens.assign(rng.normal(0, 0.5, self.tokens.shape).astype(np.float32))

    def _all_layers(self):
        layers = [self.embedding, *self.enc_prenet, *self.dec_prenet,
                  *self.ref_convs, *self.ref_bns, self.ref_gru,
                  self.stl_q, self.stl_k, self.stl_v,
                  self.attention_rnn, self.attn_query, self.attn_memory,
                  self.attn_v, self.dec_input_proj, *self.dec_rnns,
                  self.frame_proj, self.stop_proj, self.post_linear]
        if self.attention_kind == "location_sensitive":
            layers += [self.loc_conv, self.loc_proj]
        for cbhg in (self.enc_cbhg, self.post_cbhg):
            layers += list(cbhg.trackables().values())
        return layers
