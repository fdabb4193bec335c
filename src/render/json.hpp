// Minimal JSON parser for the replay config files.
//
// The replay config (config.json written by magent_tpu.render.generator,
// same schema as the reference's RenderGenerator, reference:
// src/gridworld/RenderGenerator.cc:57-105) only uses objects, arrays,
// strings, numbers and booleans — this parser supports exactly that.
// Replaces the reference's jsoncpp dependency (reference:
// src/render/backend/data.cc:252-400) with a self-contained header.
#ifndef MAGENT_TPU_RENDER_JSON_HPP_
#define MAGENT_TPU_RENDER_JSON_HPP_

#include <cctype>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace magent_tpu {
namespace json {

class Value;
using ValuePtr = std::shared_ptr<Value>;

class Value {
public:
    enum class Kind { Null, Bool, Number, String, Array, Object };

    Kind kind = Kind::Null;
    bool boolean = false;
    double number = 0.0;
    std::string str;
    std::vector<ValuePtr> arr;
    std::map<std::string, ValuePtr> obj;

    bool has(const std::string &key) const { return obj.count(key) != 0; }

    const Value &at(const std::string &key) const {
        auto it = obj.find(key);
        if (it == obj.end()) throw std::runtime_error("missing key: " + key);
        return *it->second;
    }

    unsigned asUInt() const {
        if (kind != Kind::Number || number < 0)
            throw std::runtime_error("expected a non-negative number");
        return static_cast<unsigned>(number);
    }
    double asDouble() const {
        if (kind != Kind::Number) throw std::runtime_error("expected a number");
        return number;
    }
    const std::string &asString() const {
        if (kind != Kind::String) throw std::runtime_error("expected a string");
        return str;
    }
};

class Parser {
public:
    explicit Parser(const std::string &text) : s_(text), pos_(0) {}

    ValuePtr parse() {
        ValuePtr v = parseValue();
        skipWs();
        return v;
    }

private:
    const std::string &s_;
    size_t pos_;

    void skipWs() {
        while (pos_ < s_.size() && std::isspace(static_cast<unsigned char>(s_[pos_]))) pos_++;
    }

    char peek() {
        skipWs();
        if (pos_ >= s_.size()) throw std::runtime_error("unexpected end of JSON");
        return s_[pos_];
    }

    void expect(char c) {
        if (peek() != c) throw std::runtime_error(std::string("expected '") + c + "'");
        pos_++;
    }

    ValuePtr parseValue() {
        char c = peek();
        if (c == '{') return parseObject();
        if (c == '[') return parseArray();
        if (c == '"') return parseString();
        if (c == 't' || c == 'f') return parseBool();
        if (c == 'n') { pos_ += 4; return std::make_shared<Value>(); }
        return parseNumber();
    }

    ValuePtr parseObject() {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::Object;
        expect('{');
        if (peek() == '}') { pos_++; return v; }
        while (true) {
            ValuePtr key = parseString();
            expect(':');
            v->obj[key->str] = parseValue();
            char c = peek();
            pos_++;
            if (c == '}') break;
            if (c != ',') throw std::runtime_error("expected ',' or '}'");
        }
        return v;
    }

    ValuePtr parseArray() {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::Array;
        expect('[');
        if (peek() == ']') { pos_++; return v; }
        while (true) {
            v->arr.push_back(parseValue());
            char c = peek();
            pos_++;
            if (c == ']') break;
            if (c != ',') throw std::runtime_error("expected ',' or ']'");
        }
        return v;
    }

    ValuePtr parseString() {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::String;
        expect('"');
        while (pos_ < s_.size() && s_[pos_] != '"') {
            char c = s_[pos_++];
            if (c == '\\' && pos_ < s_.size()) {
                char e = s_[pos_++];
                switch (e) {
                    case 'n': v->str += '\n'; break;
                    case 't': v->str += '\t'; break;
                    case '"': v->str += '"'; break;
                    case '\\': v->str += '\\'; break;
                    case '/': v->str += '/'; break;
                    default: v->str += e;
                }
            } else {
                v->str += c;
            }
        }
        if (pos_ >= s_.size()) throw std::runtime_error("unterminated string");
        pos_++;
        return v;
    }

    ValuePtr parseBool() {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::Bool;
        if (s_.compare(pos_, 4, "true") == 0) { v->boolean = true; pos_ += 4; }
        else if (s_.compare(pos_, 5, "false") == 0) { v->boolean = false; pos_ += 5; }
        else throw std::runtime_error("invalid literal");
        return v;
    }

    ValuePtr parseNumber() {
        auto v = std::make_shared<Value>();
        v->kind = Value::Kind::Number;
        size_t start = pos_;
        while (pos_ < s_.size() &&
               (std::isdigit(static_cast<unsigned char>(s_[pos_])) ||
                s_[pos_] == '-' || s_[pos_] == '+' || s_[pos_] == '.' ||
                s_[pos_] == 'e' || s_[pos_] == 'E'))
            pos_++;
        v->number = std::stod(s_.substr(start, pos_ - start));
        return v;
    }
};

inline ValuePtr parse(const std::string &text) { return Parser(text).parse(); }

}  // namespace json
}  // namespace magent_tpu

#endif  // MAGENT_TPU_RENDER_JSON_HPP_
