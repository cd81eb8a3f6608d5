// Native .rten container reader.
//
// The runtime analog of the reference's Rust loader (src/model.rs +
// src/header.rs): parses the V2 container header and the FlatBuffers
// model data in C++, emitting a compact JSON description of the graph.
// Tensor data is NOT copied — constants are described by
// (dtype, shape, byte offset, length) into the caller's mmap, so Python
// materializes zero-copy numpy views exactly like the reference's
// ArcTensorView (src/constant_storage.rs).
//
// Exposed C ABI (ctypes):
//   char* rten_read_model(const uint8_t* buf, uint64_t len);  // malloc'd JSON
//   void  rten_free(char* p);
//
// On error the returned JSON is {"error": "..."}.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

struct Buf {
  const uint8_t* data;
  uint64_t len;
};

template <typename T>
T ReadScalar(const Buf& b, uint64_t pos) {
  T out;
  std::memcpy(&out, b.data + pos, sizeof(T));
  return out;
}

// ---------------------------------------------------------------------------
// FlatBuffers primitives
// ---------------------------------------------------------------------------

uint64_t Indirect(const Buf& b, uint64_t pos) {
  return pos + ReadScalar<uint32_t>(b, pos);
}

// Absolute position of field `slot`, or 0 if absent.
uint64_t FieldPos(const Buf& b, uint64_t table, int slot) {
  int32_t soffset = ReadScalar<int32_t>(b, table);
  uint64_t vtable = table - soffset;
  uint16_t vt_len = ReadScalar<uint16_t>(b, vtable);
  int entry = 4 + 2 * slot;
  if (entry >= vt_len) return 0;
  uint16_t off = ReadScalar<uint16_t>(b, vtable + entry);
  if (off == 0) return 0;
  return table + off;
}

template <typename T>
T FieldScalar(const Buf& b, uint64_t table, int slot, T def) {
  uint64_t pos = FieldPos(b, table, slot);
  if (!pos) return def;
  return ReadScalar<T>(b, pos);
}

// Vector helpers: return position of the length prefix, or 0.
uint64_t FieldVector(const Buf& b, uint64_t table, int slot) {
  uint64_t pos = FieldPos(b, table, slot);
  if (!pos) return 0;
  return Indirect(b, pos);
}

uint32_t VecLen(const Buf& b, uint64_t vec) {
  return ReadScalar<uint32_t>(b, vec);
}

std::string FieldString(const Buf& b, uint64_t table, int slot) {
  uint64_t pos = FieldPos(b, table, slot);
  if (!pos) return "";
  uint64_t s = Indirect(b, pos);
  uint32_t n = ReadScalar<uint32_t>(b, s);
  return std::string(reinterpret_cast<const char*>(b.data + s + 4), n);
}

// ---------------------------------------------------------------------------
// JSON emission
// ---------------------------------------------------------------------------

void JsonEscape(std::string* out, const std::string& s) {
  out->push_back('"');
  for (unsigned char c : s) {
    switch (c) {
      case '"': *out += "\\\""; break;
      case '\\': *out += "\\\\"; break;
      case '\n': *out += "\\n"; break;
      case '\r': *out += "\\r"; break;
      case '\t': *out += "\\t"; break;
      default:
        if (c < 0x20) {
          char hex[8];
          std::snprintf(hex, sizeof(hex), "\\u%04x", c);
          *out += hex;
        } else {
          out->push_back(static_cast<char>(c));
        }
    }
  }
  out->push_back('"');
}

void AppendU64(std::string* out, uint64_t v) {
  char tmp[24];
  std::snprintf(tmp, sizeof(tmp), "%llu", (unsigned long long)v);
  *out += tmp;
}

void AppendI64(std::string* out, long long v) {
  char tmp[24];
  std::snprintf(tmp, sizeof(tmp), "%lld", v);
  *out += tmp;
}

void AppendF32(std::string* out, float v) {
  char tmp[40];
  std::snprintf(tmp, sizeof(tmp), "%.9g", v);
  *out += tmp;
}

// ---------------------------------------------------------------------------
// Schema walk (matches rten_tpu/fmt/schema.py slot layout)
// ---------------------------------------------------------------------------

// Generic: serialize an attrs table as {"_fields": raw scalars} is not
// enough — attrs decoding is schema-driven on the Python side. Instead we
// re-emit the attrs table generically: slot index -> value for scalar
// slots plus vectors/strings. Python re-interprets via its schema tables.
// Union member tables are emitted by the caller who knows the type.

struct Ctx {
  const Buf* buf;
  uint64_t tensor_data_offset;
  std::string out;
};

void EmitUIntVector(Ctx* c, uint64_t vec) {
  c->out += "[";
  uint32_t n = VecLen(*c->buf, vec);
  for (uint32_t i = 0; i < n; i++) {
    if (i) c->out += ",";
    AppendU64(&c->out, ReadScalar<uint32_t>(*c->buf, vec + 4 + 4 * i));
  }
  c->out += "]";
}

void EmitIntVector(Ctx* c, uint64_t vec) {
  c->out += "[";
  uint32_t n = VecLen(*c->buf, vec);
  for (uint32_t i = 0; i < n; i++) {
    if (i) c->out += ",";
    AppendI64(&c->out, ReadScalar<int32_t>(*c->buf, vec + 4 + 4 * i));
  }
  c->out += "]";
}

void EmitGraph(Ctx* c, uint64_t graph);

// Emit one attrs table generically: {"slots": {"0": ..}} keyed by slot
// index with typed guesses is fragile; instead Python passes through the
// *byte range* of the attrs table? Simpler and robust: emit the union
// type id + table position, and let Python decode attrs itself (attrs
// tables are tiny — the hot cost is the node/tensor walk, which we do
// here). Subgraphs (If) are recursed natively.
void EmitOperator(Ctx* c, uint64_t op_table) {
  // OperatorNode slots: type=0, attrs_type=1, attrs=2, inputs=3, outputs=4
  c->out += "{\"type\":";
  AppendU64(&c->out, FieldScalar<uint8_t>(*c->buf, op_table, 0, 0));
  uint8_t attrs_type = FieldScalar<uint8_t>(*c->buf, op_table, 1, 0);
  if (attrs_type) {
    c->out += ",\"attrs_type\":";
    AppendU64(&c->out, attrs_type);
    uint64_t attrs_pos = FieldPos(*c->buf, op_table, 2);
    if (attrs_pos) {
      c->out += ",\"attrs_pos\":";
      AppendU64(&c->out, Indirect(*c->buf, attrs_pos));
    }
  }
  uint64_t inputs = FieldVector(*c->buf, op_table, 3);
  if (inputs) {
    c->out += ",\"inputs\":";
    EmitIntVector(c, inputs);
  }
  uint64_t outputs = FieldVector(*c->buf, op_table, 4);
  if (outputs) {
    c->out += ",\"outputs\":";
    EmitIntVector(c, outputs);
  }
  c->out += "}";
}

void EmitConstant(Ctx* c, uint64_t table) {
  // ConstantNode slots: shape=0, data_type=1, data=2, dtype=3,
  // data_offset=4.
  c->out += "{\"shape\":";
  uint64_t shape = FieldVector(*c->buf, table, 0);
  if (shape) {
    EmitUIntVector(c, shape);
  } else {
    c->out += "[]";
  }
  uint64_t dtype_pos = FieldPos(*c->buf, table, 3);
  if (dtype_pos) {
    c->out += ",\"dtype\":";
    AppendU64(&c->out, ReadScalar<uint16_t>(*c->buf, dtype_pos));
  }
  uint64_t off_pos = FieldPos(*c->buf, table, 4);
  if (off_pos) {
    // External data: absolute byte offset into the file.
    c->out += ",\"data_offset\":";
    AppendU64(&c->out, c->tensor_data_offset +
                           ReadScalar<uint64_t>(*c->buf, off_pos));
  } else {
    uint8_t data_type = FieldScalar<uint8_t>(*c->buf, table, 1, 0);
    uint64_t data_pos = FieldPos(*c->buf, table, 2);
    if (data_type && data_pos) {
      // Inline FloatData(1)/IntData(2): data vector is slot 0 of the
      // member table; emit its absolute byte offset + element count so
      // Python can build a zero-copy view.
      uint64_t member = Indirect(*c->buf, data_pos);
      uint64_t vec = FieldVector(*c->buf, member, 0);
      if (vec) {
        c->out += ",\"inline_kind\":";
        AppendU64(&c->out, data_type);
        c->out += ",\"inline_offset\":";
        AppendU64(&c->out, vec + 4);
        c->out += ",\"inline_len\":";
        AppendU64(&c->out, VecLen(*c->buf, vec));
      }
    }
  }
  c->out += "}";
}

void EmitValue(Ctx* c, uint64_t table) {
  // ValueNode slots: shape=0 ([Dim]).
  c->out += "{";
  uint64_t dims = FieldVector(*c->buf, table, 0);
  if (dims) {
    c->out += "\"shape\":[";
    uint32_t n = VecLen(*c->buf, dims);
    for (uint32_t i = 0; i < n; i++) {
      if (i) c->out += ",";
      uint64_t dim = Indirect(*c->buf, dims + 4 + 4 * i);
      // Dim slots: value=0 (uint), name=1 (string).
      std::string name = FieldString(*c->buf, dim, 1);
      if (!name.empty()) {
        JsonEscape(&c->out, name);
      } else {
        AppendU64(&c->out, FieldScalar<uint32_t>(*c->buf, dim, 0, 0));
      }
    }
    c->out += "]";
  }
  c->out += "}";
}

void EmitGraph(Ctx* c, uint64_t graph) {
  // Graph slots: nodes=0, inputs=1, outputs=2, captures=3.
  c->out += "{\"nodes\":[";
  uint64_t nodes = FieldVector(*c->buf, graph, 0);
  uint32_t n = nodes ? VecLen(*c->buf, nodes) : 0;
  for (uint32_t i = 0; i < n; i++) {
    if (i) c->out += ",";
    uint64_t node = Indirect(*c->buf, nodes + 4 + 4 * i);
    // Node slots: name=0, data_type=1, data=2.
    c->out += "{\"name\":";
    std::string name = FieldString(*c->buf, node, 0);
    if (name.empty()) {
      c->out += "null";
    } else {
      JsonEscape(&c->out, name);
    }
    uint8_t kind = FieldScalar<uint8_t>(*c->buf, node, 1, 0);
    uint64_t data_pos = FieldPos(*c->buf, node, 2);
    c->out += ",\"kind\":";
    AppendU64(&c->out, kind);
    if (kind && data_pos) {
      uint64_t data = Indirect(*c->buf, data_pos);
      c->out += ",\"data\":";
      switch (kind) {  // NodeKind union order: Operator=1, Constant=2, Value=3
        case 1: EmitOperator(c, data); break;
        case 2: EmitConstant(c, data); break;
        case 3: EmitValue(c, data); break;
        default: c->out += "null";
      }
    }
    c->out += "}";
  }
  c->out += "]";
  uint64_t inputs = FieldVector(*c->buf, graph, 1);
  if (inputs) {
    c->out += ",\"inputs\":";
    EmitUIntVector(c, inputs);
  }
  uint64_t outputs = FieldVector(*c->buf, graph, 2);
  if (outputs) {
    c->out += ",\"outputs\":";
    EmitUIntVector(c, outputs);
  }
  uint64_t captures = FieldVector(*c->buf, graph, 3);
  if (captures) {
    c->out += ",\"captures\":";
    EmitUIntVector(c, captures);
  }
  c->out += "}";
}

std::string ReadModel(const uint8_t* data, uint64_t len) {
  Buf file{data, len};
  if (len < 32) return "{\"error\":\"file too short\"}";
  uint64_t model_offset = 0, tensor_offset = 0;
  if (std::memcmp(data, "RTEN", 4) == 0 &&
      std::memcmp(data + 4, "RTEN", 4) != 0) {
    uint32_t version = ReadScalar<uint32_t>(file, 4);
    if (version != 2) return "{\"error\":\"unsupported version\"}";
    model_offset = ReadScalar<uint64_t>(file, 8);
    uint64_t model_len = ReadScalar<uint64_t>(file, 16);
    tensor_offset = ReadScalar<uint64_t>(file, 24);
    if (model_offset + model_len > len)
      return "{\"error\":\"invalid model bounds\"}";
  }
  Ctx ctx;
  ctx.buf = &file;
  ctx.tensor_data_offset = tensor_offset;
  ctx.out.reserve(1 << 20);

  uint64_t root = Indirect(file, model_offset);
  // Model slots: schema_version=0, graph=1, metadata=2.
  ctx.out += "{\"graph\":";
  uint64_t graph_pos = FieldPos(file, root, 1);
  if (!graph_pos) return "{\"error\":\"model has no graph\"}";
  EmitGraph(&ctx, Indirect(file, graph_pos));

  uint64_t meta_pos = FieldPos(file, root, 2);
  if (meta_pos) {
    uint64_t meta = Indirect(file, meta_pos);
    static const char* kMetaFields[] = {
        "onnx_hash", "description", "license", "commit",
        "code_repository", "model_repository", "run_id", "run_url"};
    ctx.out += ",\"metadata\":{";
    bool first = true;
    for (int slot = 0; slot < 8; slot++) {
      std::string v = FieldString(file, meta, slot);
      if (v.empty()) continue;
      if (!first) ctx.out += ",";
      first = false;
      ctx.out += "\"";
      ctx.out += kMetaFields[slot];
      ctx.out += "\":";
      JsonEscape(&ctx.out, v);
    }
    ctx.out += "}";
  }
  ctx.out += "}";
  return ctx.out;
}

}  // namespace

extern "C" {

char* rten_read_model(const uint8_t* buf, uint64_t len) {
  std::string json;
  json = ReadModel(buf, len);
  char* out = static_cast<char*>(std::malloc(json.size() + 1));
  std::memcpy(out, json.data(), json.size() + 1);
  return out;
}

void rten_free(char* p) { std::free(p); }

}  // extern "C"
