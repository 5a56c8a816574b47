"""Deterministic NEAR-shaped fixture generator (FIXTURES.md F1-F7).

Writes one ``NNNNNNNNNNNN.block.json`` and per-shard
``NNNNNNNNNNNN.shard.S.json`` file per block — the same file-per-object
layout near-lake-indexer writes to S3 (Mainnet Loader.py:20-42), so the
bronze stream source (sources/json_stream.py) exercises the real
glob-filtered file discovery path.

No RNG: content is a pure function of (height, shard). Scenario coverage
rotates by height so every action kind (F6), status variant (F3), event
standard (F7, incl. malformed + FAILURE-status), plus the cross-fixture
invariants (receipt lineage into later blocks, one orphan shard, the
CREATE->TRANSFER->DELETE account arc) all appear in ~40 blocks.
"""

from __future__ import annotations

import json
import os

GENESIS_NS = 1_709_251_200_000_000_000  # 2024-03-01T00:00:00Z
BLOCK_INTERVAL_NS = 2_400 * 1_000_000_000  # 40 min => ~2.2 days over 80 blocks
EPOCH_BLOCKS = 40

ACTION_KINDS = [
    '"CreateAccount"',
    '{"DeployContract": {"code": "Y29kZQ=="}}',
    '{"Transfer": {"deposit": "1000000000000000000000000"}}',
    '{"Stake": {"stake": "5000000000000000000000000", "public_key": "ed25519:pkstake"}}',
    '{"AddKey": {"public_key": "ed25519:pkfull", "access_key": {"nonce": 0, "permission": "FullAccess"}}}',
    '{"AddKey": {"public_key": "ed25519:pkfc", "access_key": {"nonce": 0, "permission": {"FunctionCall": {"allowance": "250000000000000000000000", "receiver_id": "ft.near", "method_names": ["ft_transfer"]}}}}}',
    '{"DeleteKey": {"public_key": "ed25519:pkfull"}}',
    '{"DeleteAccount": {"beneficiary_id": "alice.near"}}',
    '{"Delegate": {"delegate_action": {"actions": [], "max_block_height": "999", "nonce": "7", "public_key": "ed25519:pkdel", "receiver_id": "bob.near", "sender_id": "alice.near"}, "signature": "sigdel"}}',
]


def _b64(obj) -> str:
    import base64

    return base64.b64encode(json.dumps(obj).encode()).decode()


def _fc_action(method: str, args: dict, receiver: str = "ft.near") -> str:
    return json.dumps(
        {
            "FunctionCall": {
                "args": _b64(args),
                "deposit": "0",
                "gas": 30000000000000,
                "method_name": method,
            }
        }
    )


def _event_log(standard: str, event: str, data: list | dict) -> str:
    return "EVENT_JSON:" + json.dumps(
        {"standard": standard, "version": "1.0.0", "event": event, "data": data}
    )


def _block_hash(h: int) -> str:
    return f"BLOCK{h:06d}"


def _tx_hash(h: int, s: int, i: int) -> str:
    return f"TX{h:06d}S{s}N{i}"


def _receipt_id(h: int, s: int, i: int) -> str:
    return f"RCPT{h:06d}S{s}N{i}"


SIGNERS = ["alice.near", "bob.near", "carol.near"]


def _scenario(height: int, shard: int):
    """Pick the (actions, receiver, logs, status) scenario for a tx."""
    k = (height * 2 + shard) % 12
    signer = SIGNERS[height % 3]
    if k == 0:
        return signer, "bob.near", [ACTION_KINDS[2]], "SuccessReceiptId", []
    if k == 1:
        return (
            signer,
            "ft.near",
            [_fc_action("ft_transfer", {"receiver_id": "bob.near", "amount": "100"})],
            "SuccessValue",
            [
                _event_log(
                    "nep141",
                    "ft_transfer",
                    [
                        {
                            "old_owner_id": signer,
                            "new_owner_id": "bob.near",
                            "amount": "100",
                            "memo": None,
                        }
                    ],
                )
            ],
        )
    if k == 2:
        return signer, "temp.near", [ACTION_KINDS[0], ACTION_KINDS[2]], "SuccessReceiptId", []
    if k == 3:
        return (
            signer,
            "aurora.poolv1.near",
            [_fc_action("deposit_and_stake", {}, "aurora.poolv1.near")],
            "SuccessValue",
            [],
        )
    if k == 4:
        return (
            signer,
            "social.near",
            [
                _fc_action(
                    "set",
                    {
                        "data": {
                            signer: {
                                "post": {"main": json.dumps({"type": "md", "text": f"post {height}"})},
                                "profile": {"name": f"user {signer}"},
                            }
                        }
                    },
                    "social.near",
                )
            ],
            "SuccessValue",
            [],
        )
    if k == 5:
        return (
            signer,
            "nft.near",
            [_fc_action("nft_transfer", {"token_id": "t1", "receiver_id": "bob.near"}, "nft.near")],
            "SuccessValue",
            [
                _event_log(
                    "nep171",
                    "nft_transfer",
                    [
                        {
                            "old_owner_id": signer,
                            "new_owner_id": "bob.near",
                            "token_ids": ["t1", "t2"],
                            "authorized_id": None,
                            "memo": None,
                        }
                    ],
                )
            ],
        )
    if k == 6:
        return signer, "bob.near", [ACTION_KINDS[4]], "SuccessValue", []
    if k == 7:
        return signer, "temp.near", [ACTION_KINDS[7]], "SuccessValue", []
    if k == 8:
        return (
            signer,
            "intents.near",
            [_fc_action("mt_transfer", {}, "intents.near")],
            "SuccessValue",
            [
                _event_log(
                    "nep245",
                    "mt_transfer",
                    [
                        {
                            "old_owner_id": signer,
                            "new_owner_id": "bob.near",
                            "token_ids": ["nep141:usdc"],
                            "amounts": ["7"],
                            "memo": "m",
                        }
                    ],
                ),
                _event_log(
                    "dip4",
                    "token_diff",
                    [
                        {
                            "account_id": signer,
                            "diff": {"nep141:usdc": -7, "nep141:wnear": 3},
                            "intent_hash": f"H{height}",
                            "referral": "r.near",
                        }
                    ],
                ),
                _event_log(
                    "dip4",
                    "intents_executed",
                    [{"account_id": signer, "intent_hash": f"H{height}"}],
                ),
                # object-data dip4 events (the defuse MVs read these without
                # arrayJoin — data is a single JSON object, not an array)
                _event_log(
                    "dip4",
                    "public_key_added",
                    {"account_id": signer, "public_key": f"ed25519:PK{height}"},
                ),
                _event_log(
                    "dip4",
                    "fee_changed",
                    {"old_fee": "100", "new_fee": "150"},
                ),
            ],
        )
    if k == 9:  # failure outcome: its events must be excluded downstream
        return (
            signer,
            "ft.near",
            [_fc_action("ft_transfer", {"receiver_id": "x.near", "amount": "1"})],
            "Failure",
            [
                _event_log(
                    "nep141",
                    "ft_mint",
                    [{"owner_id": signer, "amount": "5"}],
                )
            ],
        )
    if k == 10:  # malformed EVENT_JSON + plain log: must not break parsing
        return (
            signer,
            "ft.near",
            [_fc_action("ft_mint_all", {})],
            "SuccessValue",
            ["EVENT_JSON:{not valid json", "plain log line"],
        )
    return (
        signer,
        "bob.near",
        [ACTION_KINDS[1], ACTION_KINDS[3], ACTION_KINDS[5], ACTION_KINDS[6], ACTION_KINDS[8]],
        "SuccessValue",
        [],
    )


def _make_tx(height: int, shard: int, i: int) -> dict:
    signer, receiver, actions, status_kind, logs = _scenario(height, shard)
    txh = _tx_hash(height, shard, i)
    rid = _receipt_id(height, shard, i)
    if status_kind == "SuccessReceiptId":
        status = {"SuccessReceiptId": rid}
    elif status_kind == "SuccessValue":
        status = {"SuccessValue": ""}
    elif status_kind == "Failure":
        status = {"Failure": json.dumps({"error": "ActionError"})}
    else:
        status = {}
    return {
        "transaction": {
            "hash": txh,
            "nonce": height * 10 + i,
            "public_key": "ed25519:pksigner",
            "receiver_id": receiver,
            "signature": "sig",
            "signer_id": signer,
            "actions": actions,
        },
        "outcome": {
            "execution_outcome": {
                "block_hash": _block_hash(height),
                "id": txh,
                "outcome": {
                    "executor_id": signer,
                    "gas_burnt": 424555062500 + height,
                    "logs": [],
                    "receipt_ids": [rid],
                    "status": status,
                    "tokens_burnt": "42455506250000000000",
                },
            }
        },
        "receipt": None,
        "_logs": logs,  # stashed for the outcome in the next block
        "_receiver": receiver,
        "_signer": signer,
        "_status_kind": status_kind,
        "_actions": actions,
    }


def generate_fixtures(out_dir: str, n_blocks: int = 80, n_shards: int = 2) -> dict:
    """Write block/shard JSON files; return summary counts."""
    os.makedirs(out_dir, exist_ok=True)
    pending: dict[int, list[dict]] = {}  # receipts to land at height h
    counts = {"blocks": 0, "shards": 0, "transactions": 0, "receipts": 0}

    for h in range(n_blocks):
        ts = GENESIS_NS + h * BLOCK_INTERVAL_NS
        bh = _block_hash(h)
        prev = _block_hash(h - 1) if h > 0 else "GENESIS"
        epoch = f"EPOCH{h // EPOCH_BLOCKS:03d}"
        block = {
            "author": f"validator{h % 5}.poolv1.near",
            "header": {
                "height": 1_000_000 + h,
                "timestamp": ts,
                "hash": bh,
                "prev_hash": prev,
                "epoch_id": epoch,
                "total_supply": str(10**33 + h * 10**24),
                "gas_price": "100000000",
            },
            "chunks": [f"chunksummary{h}s{s}" for s in range(n_shards)],
        }
        with open(os.path.join(out_dir, f"{h:012d}.block.json"), "w") as f:
            json.dump(block, f)
        counts["blocks"] += 1

        for s in range(n_shards):
            txs = [_make_tx(h, s, i) for i in range(2)]
            counts["transactions"] += len(txs)

            # Receipts converted from txs of the PREVIOUS block (lineage
            # invariant #2: converted receipt lands in a later block).
            landed = pending.pop(h, []) if s == 0 else []
            receipts, outcomes = [], []
            for p in landed:
                receipts.append(p["receipt"])
                outcomes.append(p["outcome"])
                counts["receipts"] += 1

            # Queue this block's tx receipts for the next block.
            for i, tx in enumerate(txs):
                rid = _receipt_id(h, s, i)
                action_receipt = {
                    "predecessor_id": tx["_signer"],
                    "receiver_id": tx["_receiver"],
                    "receipt_id": rid,
                    "receipt": {
                        "Action": {
                            "actions": tx["_actions"],
                            "gas_price": "122987387",
                            # odd txs consume the data receipt emitted 4
                            # blocks earlier (input/output data flow, F4)
                            "input_data_ids": [f"DATA{h - 4:06d}S{s}N0"]
                            if i == 1 and h >= 4 and h % 4 == 0
                            else [],
                            "output_data_receivers": [
                                {"data_id": f"DATA{h:06d}S{s}N{i}", "receiver_id": "carol.near"}
                            ]
                            if i == 0
                            else [],
                            "signer_id": tx["_signer"],
                            "signer_public_key": "ed25519:pksigner",
                        }
                    },
                }
                child_rid = f"CHILD{rid}"
                outcome = {
                    "execution_outcome": {
                        "block_hash": _block_hash(h + 1),
                        "id": rid,
                        "outcome": {
                            "executor_id": tx["_receiver"],
                            "gas_burnt": 2 * 10**12,
                            "logs": tx["_logs"],
                            "receipt_ids": [child_rid],
                            "status": {"Failure": json.dumps({"error": "ActionError"})}
                            if tx["_status_kind"] == "Failure"
                            else {"SuccessValue": ""},
                            "tokens_burnt": "1000000000000000000000",
                        },
                    },
                    "receipt": action_receipt,
                }
                pending.setdefault(h + 1, []).append(
                    {"receipt": action_receipt, "outcome": outcome}
                )
                # A data receipt riding along every 4th block (F4 Data kind).
                if i == 0 and h % 4 == 0:
                    receipts.append(
                        {
                            "predecessor_id": "system",
                            "receiver_id": "carol.near",
                            "receipt_id": f"DATARCPT{h:06d}S{s}",
                            "receipt": {
                                "Data": {
                                    "data_id": f"DATA{h:06d}S{s}N0",
                                    "data": _b64({"ok": True}) if h % 8 == 0 else None,
                                }
                            },
                        }
                    )
                    counts["receipts"] += 1

            state_changes = [
                {
                    "type": "account_update",
                    "cause": {
                        "type": "transaction_processing",
                        "receipt_hash": None,
                        "tx_hash": _tx_hash(h, s, 0),
                    },
                    "change": {
                        "account_id": SIGNERS[h % 3],
                        "amount": str(10**24 * (100 + h)),
                        "locked": "0",
                        "code_hash": "11111111111111111111111111111111",
                        "storage_paid_at": 0,
                        "storage_usage": 500 + h,
                        "access_key": None,
                        "public_key": None,
                        "key_base64": None,
                        "value_base64": None,
                        "code_base64": None,
                    },
                },
                {
                    "type": "access_key_update",
                    "cause": {
                        "type": "receipt_processing",
                        "receipt_hash": _receipt_id(h, s, 0),
                        "tx_hash": None,
                    },
                    "change": {
                        "account_id": SIGNERS[(h + 1) % 3],
                        "amount": None,
                        "locked": None,
                        "code_hash": None,
                        "storage_paid_at": None,
                        "storage_usage": None,
                        "access_key": {"nonce": h, "permission": "FullAccess"},
                        "public_key": "ed25519:pkfull",
                        "key_base64": None,
                        "value_base64": None,
                        "code_base64": None,
                    },
                },
            ]

            shard = {
                "chunk": {
                    "author": f"validator{(h + s) % 5}.poolv1.near",
                    "header": {
                        "chunk_hash": f"CHUNK{h:06d}S{s}",
                        "shard_id": s,
                        "signature": "chunksig",
                        "gas_limit": 10**15,
                        "gas_used": 10**12 + h,
                        "height_created": 1_000_000 + h,
                        "height_included": 1_000_000 + h,
                        # Orphan shard at h==37: violates the J1 join key on
                        # purpose (cross-fixture invariant #1).
                        "prev_block_hash": "ORPHAN" if h == 37 and s == 1 else prev,
                        "balance_burnt": "2000000000000000000000",
                        "encoded_length": 4000 + h,
                        "encoded_merkle_root": "emr",
                        "outcome_root": "or",
                        "outgoing_receipts_root": "ogr",
                        "prev_state_root": "psr",
                        "rent_paid": "0",
                        "tx_root": "txr",
                        "validator_proposals": [],
                        "validator_reward": "0",
                    },
                    "transactions": [
                        json.dumps({k: v for k, v in tx.items() if not k.startswith("_")})
                        for tx in txs
                    ],
                    "receipts": [json.dumps(r) for r in receipts],
                },
                "receipt_execution_outcomes": [json.dumps(o) for o in outcomes],
                "state_changes": state_changes,
            }
            with open(os.path.join(out_dir, f"{h:012d}.shard.{s}.json"), "w") as f:
                json.dump(shard, f)
            counts["shards"] += 1

    return counts
